"""Tests of the classic PGAS baseline (explicit parameter draws)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.algorithms import build_pgas
from bipk_tpu.ops import mniw


def _ar1_data(key, a=0.85, q=0.3, r=0.4, T=120):
    """Linear-Gaussian AR(1): x_t = a x_{t-1} + w, y_t = x_t + v."""
    def step(x, k):
        kw, kv = jax.random.split(k)
        xn = a * x + q * jax.random.normal(kw, (1,), jnp.float64)
        y = xn + r * jax.random.normal(kv, (1,), jnp.float64)
        return xn, (xn, y)

    keys = jax.random.split(key, T - 1)
    x0 = jnp.zeros((1,), dtype=jnp.float64)
    _, (xs, ys) = jax.lax.scan(step, x0, keys)
    X = jnp.concatenate([x0[None], xs])
    Y = jnp.concatenate([jnp.zeros((1, 1), dtype=jnp.float64), ys])
    return X, Y


@pytest.fixture(scope="module")
def pgas_ar1():
    """PGAS with a single linear basis phi(x)=x learns the AR coefficient.

    The observation noise is small so the exact conditional posterior of
    the coefficient concentrates at the least-squares value computed from
    the *realized* latent trajectory — a sharp analytic target (the
    generative coefficient itself is only recovered up to finite-sample
    autocorrelation error).
    """
    a_true, q_true, r_obs = 0.85, 0.3, 0.1
    T = 120
    key = jax.random.key(7)
    key, key_sim = jax.random.split(key)
    X, Y = _ar1_data(key_sim, a_true, q_true, r_obs, T)

    prior = mniw.natural_from_standard(
        np.zeros((1, 1)), np.eye(1) * 10.0, np.eye(1) * 0.1, 3.0
    )
    run = jax.jit(
        build_pgas(
            basis_fn=lambda x, u: x,
            likelihood_fn=lambda obs, x, u: jnp.squeeze(
                -0.5 * ((obs[0] - x[0]) / r_obs) ** 2
                - jnp.log(r_obs)
                - 0.5 * jnp.log(2 * jnp.pi)
            ),
            prior=prior,
            n_particles=80,
            n_iterations=200,
            dtype=jnp.float64,
        )
    )
    inputs = jnp.zeros((T, 0))
    res = run(
        key,
        Y,
        inputs,
        np.zeros(1),
        np.eye(1) * 1e-2,
        np.asarray(X),
    )
    return a_true, q_true, X, Y, res


def test_shapes(pgas_ar1):
    a_true, q_true, X, Y, res = pgas_ar1
    T = X.shape[0]
    assert res.states.shape == (T, 200, 1)
    assert res.coeffs.shape == (200, 1, 1)
    assert res.covs.shape == (200, 1, 1)
    assert res.log_likelihood.shape == (T, 200)
    assert np.all(np.isfinite(np.asarray(res.log_likelihood)))


def test_ar_coefficient_posterior(pgas_ar1):
    """Posterior over the AR coefficient concentrates at the conditional
    (given-latent-states) least-squares value."""
    a_true, q_true, X, Y, res = pgas_ar1
    xn = np.asarray(X)[:, 0]
    ls = np.sum(xn[1:] * xn[:-1]) / np.sum(xn[:-1] ** 2)
    a_draws = np.asarray(res.coeffs[100:, 0, 0])
    assert abs(a_draws.mean() - ls) < 0.08, (a_draws.mean(), ls)


def test_noise_posterior(pgas_ar1):
    """Posterior over the process variance concentrates near q^2."""
    a_true, q_true, X, Y, res = pgas_ar1
    s_draws = np.asarray(res.covs[100:, 0, 0])
    assert abs(np.median(s_draws) - q_true**2) < 0.05, np.median(s_draws)


def test_chain_moves(pgas_ar1):
    a_true, q_true, X, Y, res = pgas_ar1
    diffs = np.abs(np.diff(np.asarray(res.states[:, :, 0]), axis=1)).mean(0)
    assert np.all(diffs > 1e-4)
