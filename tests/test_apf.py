"""End-to-end tests of Algorithm 1 (online APF) on the toy example."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.algorithms import build_apf
from bipk_tpu.models import toy
from bipk_tpu.ops import mniw


@pytest.fixture(scope="module")
def toy_run():
    cfg = toy.ToyConfig(n_particles=256, n_steps=40)
    model = toy.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    X, Y = toy.simulate(key_sim, cfg, dtype=jnp.float64)
    run = jax.jit(
        build_apf(
            model.ssm,
            (model.gp,),
            cfg.n_particles,
            cfg.forgetting_factor,
            dtype=jnp.float64,
        )
    )
    inputs = jnp.zeros((cfg.n_steps, 0))
    res = run(key, Y, inputs, model.x0, model.p0)
    return cfg, model, X, Y, res


def test_shapes(toy_run):
    cfg, model, X, Y, res = toy_run
    T, N = cfg.n_steps, cfg.n_particles
    assert res.states.shape == (T, N, 1)
    assert res.int_vars[0].shape == (T, N, 1)
    assert res.weights.shape == (T, N)
    assert res.ancestors.shape == (T - 1, N)
    assert res.outputs.shape == (T, N, 1)
    assert res.log_likelihood.shape == (T, N)
    assert res.final_stats[0].T1.shape == (N, cfg.n_basis, cfg.n_basis)
    assert res.stats_mean[0].T0.shape == (T, cfg.n_basis, 1)


def test_weights_normalized_and_ess_sane(toy_run):
    cfg, model, X, Y, res = toy_run
    np.testing.assert_allclose(res.weights.sum(axis=1), 1.0, rtol=1e-8)
    # the auxiliary filter should retain a healthy particle population
    assert float(res.ess[1:].mean()) > 0.25 * cfg.n_particles
    assert np.all(np.isfinite(np.asarray(res.log_likelihood)))


def test_state_tracking(toy_run):
    """Posterior interface-variable mean tracks the simulated latent state.

    In the toy model the observation is the interface variable (the model
    output is ``iv_t``, /root/reference/src/Toy_Example.py:67-72), so the
    quantity that tracks the data is ``iv``, not the lagged filter state.
    """
    cfg, model, X, Y, res = toy_run
    post_mean = jnp.einsum("tn,tnd->td", res.weights, res.int_vars[0])
    err = np.asarray(post_mean[5:, 0] - X[5:, 0])
    assert np.sqrt(np.mean(err**2)) < 3.0  # obs noise std is 2.0


def test_learned_function(toy_run):
    """Weighted final statistics recover f(x)=10 sinc(x/7) in data range."""
    cfg, model, X, Y, res = toy_run
    w = res.weights[-1]
    stats = jax.tree_util.tree_map(
        lambda s: jnp.einsum("n...,n->...", s, w), res.final_stats[0]
    )
    post = jax.tree_util.tree_map(
        lambda p, s: p + s, model.gp.prior_as(jnp.float64), stats
    )
    A = mniw.posterior_mean(post)
    # evaluate over the data-dense range (the reference's figure scripts
    # weight by data density for the same reason; sparse tails are prior-
    # dominated and noisy at small N)
    lo, hi = np.quantile(np.asarray(X), [0.1, 0.9])
    xs = jnp.linspace(float(lo), float(hi), 101)
    phis = jax.vmap(model.basis.eigen_fn)(xs[:, None])
    fhat = phis @ A[0]
    rmse = float(jnp.sqrt(jnp.mean((fhat - toy.f_true(xs)) ** 2)))
    assert rmse < 4.0, rmse  # function range is ±10, noise std 2


def test_stats_trace_matches_final(toy_run):
    """Last stats_mean entry == weighted reduction of final_stats."""
    cfg, model, X, Y, res = toy_run
    w = res.weights[-1]
    manual = jax.tree_util.tree_map(
        lambda s: jnp.einsum("n...,n->...", s, w), res.final_stats[0]
    )
    for got, expect in zip(res.stats_mean[0], manual):
        np.testing.assert_allclose(
            np.asarray(got)[-1], np.asarray(expect), rtol=1e-8, atol=1e-10
        )
