"""Chain-parallel Gibbs (n_chains=) + MCMC convergence diagnostics.

The reference runs one PGAS chain per workload with no quantitative
convergence check (SURVEY.md §4); chain parallelism and cross-chain
R-hat/ESS are rebuild additions.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.algorithms import build_gibbs
from bipk_tpu.models import toy
from bipk_tpu.utils import diagnostics

# multi-minute on the 1-vCPU CI host (mesh compiles, GSPMD,
# subprocess fixtures); excluded from the core tier
pytestmark = pytest.mark.slow

N_PARTICLES = 50
N_STEPS = 25
N_ITER = 30
N_CHAINS = 4


@pytest.fixture(scope="module")
def chain_run():
    cfg = toy.ToyConfig(n_particles=N_PARTICLES, n_steps=N_STEPS)
    model = toy.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    X, Y = toy.simulate(key_sim, cfg, dtype=jnp.float64)
    inputs = jnp.zeros((cfg.n_steps, 0))

    ref_state = jnp.zeros((N_STEPS, 1), dtype=jnp.float64)
    ref_iv = (jnp.zeros((N_STEPS, 1), dtype=jnp.float64),)

    gibbs = jax.jit(
        build_gibbs(
            model.ssm,
            (model.gp,),
            N_PARTICLES,
            N_ITER,
            dtype=jnp.float64,
            n_chains=N_CHAINS,
        )
    )
    key, key_g = jax.random.split(key)
    res = gibbs(key_g, Y, inputs, model.x0, model.p0, ref_state, ref_iv)
    return cfg, model, X, Y, inputs, ref_state, ref_iv, key_g, res


def test_chain_shapes(chain_run):
    cfg, model, X, Y, inputs, ref_state, ref_iv, key_g, res = chain_run
    assert res.states.shape == (N_CHAINS, N_STEPS, N_ITER, 1)
    assert res.int_vars[0].shape == (N_CHAINS, N_STEPS, N_ITER, 1)
    assert res.weights.shape == (N_CHAINS, N_STEPS, N_ITER)
    assert res.stats[0].T1.shape == (
        N_CHAINS, N_ITER, cfg.n_basis, cfg.n_basis,
    )
    assert np.all(np.isfinite(np.asarray(res.states)))


def test_chains_share_start_then_diverge(chain_run):
    """Every chain's first iteration is the shared initial reference; by
    the last iteration the chains have diverged through their RNG."""
    cfg, model, X, Y, inputs, ref_state, ref_iv, key_g, res = chain_run
    states = np.asarray(res.states)  # (C, T, K, 1)
    for c in range(N_CHAINS):
        np.testing.assert_allclose(
            states[c, :, 0, :], np.asarray(ref_state), rtol=1e-9
        )
    last = states[:, :, -1, 0]
    for c in range(1, N_CHAINS):
        assert np.abs(last[c] - last[0]).max() > 1e-3


def test_chain_matches_single_chain_distribution(chain_run):
    """A vmapped chain is statistically the same sampler: the cross-chain
    posterior mean of the interface variable tracks the latent state as
    well as the single-chain test does."""
    cfg, model, X, Y, inputs, ref_state, ref_iv, key_g, res = chain_run
    half = N_ITER // 2
    post = np.asarray(res.int_vars[0][:, :, half:, 0]).mean(axis=(0, 2))
    rmse = np.sqrt(np.mean((post[5:] - np.asarray(X)[5:, 0]) ** 2))
    assert rmse < 2.5, rmse


def test_per_chain_initial_references(chain_run):
    """Per-chain (C, T, ...) initial references are honored per chain."""
    cfg, model, X, Y, inputs, ref_state, ref_iv, key_g, res = chain_run
    refs = jnp.stack(
        [ref_state + 0.1 * c for c in range(N_CHAINS)]
    )
    ivs = (jnp.stack([ref_iv[0] + 0.1 * c for c in range(N_CHAINS)]),)
    gibbs = jax.jit(
        build_gibbs(
            model.ssm,
            (model.gp,),
            N_PARTICLES,
            4,
            dtype=jnp.float64,
            n_chains=N_CHAINS,
        )
    )
    res2 = gibbs(key_g, Y, inputs, model.x0, model.p0, refs, ivs)
    first = np.asarray(res2.states[:, :, 0, 0])
    for c in range(N_CHAINS):
        np.testing.assert_allclose(
            first[c], np.asarray(refs[c, :, 0]), rtol=1e-9
        )


def test_rhat_on_mixed_chains(chain_run):
    """After burn-in the four chains target the same posterior: split
    R-hat of the per-iteration trajectory mean should be near 1, and a
    deliberately broken chain set should be flagged."""
    cfg, model, X, Y, inputs, ref_state, ref_iv, key_g, res = chain_run
    half = N_ITER // 2
    # scalar summary per draw: trajectory mean of the interface variable
    draws = np.asarray(res.int_vars[0][:, :, half:, 0]).mean(axis=1)  # (C,K)
    rhat = float(diagnostics.split_rhat(draws))
    assert rhat < 1.7, rhat  # short chains: loose but real bound
    broken = draws.copy()
    broken[0] += 50.0
    assert float(diagnostics.split_rhat(broken)) > 2.0


def test_build_gibbs_chain_guards():
    cfg = toy.ToyConfig(n_particles=8, n_steps=4)
    model = toy.make_model(cfg)
    with pytest.raises(ValueError, match=">= 2"):
        build_gibbs(model.ssm, (model.gp,), 8, 4, n_chains=1)


def test_chain_mesh_guards():
    from bipk_tpu.parallel.mesh import chain_mesh as make_chain_mesh

    cfg = toy.ToyConfig(n_particles=8, n_steps=4)
    model = toy.make_model(cfg)
    mesh = make_chain_mesh(4)
    with pytest.raises(ValueError, match="requires n_chains"):
        build_gibbs(model.ssm, (model.gp,), 8, 4, chain_mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        build_gibbs(
            model.ssm, (model.gp,), 8, 4, n_chains=6, chain_mesh=mesh
        )


def test_chains_sharded_over_mesh(chain_run):
    """chain_mesh= partitions the chain axis over devices: the fused
    sampler runs with the result actually laid out across the mesh, the
    chains stay pinned to the shared start, and the posterior matches the
    single-device chain run (identical per-chain keys → the only possible
    differences are XLA reassociation noise)."""
    from bipk_tpu.parallel.mesh import chain_mesh as make_chain_mesh

    cfg, model, X, Y, inputs, ref_state, ref_iv, key_g, res = chain_run
    mesh = make_chain_mesh(N_CHAINS)
    gibbs = jax.jit(
        build_gibbs(
            model.ssm,
            (model.gp,),
            N_PARTICLES,
            N_ITER,
            dtype=jnp.float64,
            n_chains=N_CHAINS,
            chain_mesh=mesh,
        )
    )
    res_m = gibbs(key_g, Y, inputs, model.x0, model.p0, ref_state, ref_iv)
    # actually sharded: the states live on all mesh devices
    assert len(res_m.states.sharding.device_set) == N_CHAINS
    states = np.asarray(res_m.states)
    assert states.shape == (N_CHAINS, N_STEPS, N_ITER, 1)
    for c in range(N_CHAINS):
        np.testing.assert_allclose(
            states[c, :, 0, :], np.asarray(ref_state), rtol=1e-9
        )
    # same sampler, same keys: the post-burn-in posterior mean agrees with
    # the unsharded run (exact parity is not guaranteed — resampling
    # comparisons can flip under reassociation — but the distributions are
    # identical and the draws near-identical in practice)
    half = N_ITER // 2
    post_m = states[:, :, half:, 0].mean()
    post = np.asarray(res.states[:, :, half:, 0]).mean()
    np.testing.assert_allclose(post_m, post, atol=0.35)


def test_host_loop_chains_sharded_over_mesh():
    """The host-loop sampler composes with chain_mesh= too (the per-sweep
    vmapped dispatch keeps the chain axis on the mesh)."""
    from bipk_tpu.parallel.mesh import chain_mesh as make_chain_mesh

    n_particles, n_steps, n_iter, n_chains = 20, 10, 5, 4
    cfg = toy.ToyConfig(n_particles=n_particles, n_steps=n_steps)
    model = toy.make_model(cfg)
    key = jax.random.key(11)
    key, key_sim = jax.random.split(key)
    _, Y = toy.simulate(key_sim, cfg, dtype=jnp.float64)
    inputs = jnp.zeros((n_steps, 0))
    ref_state = jnp.zeros((n_steps, 1), dtype=jnp.float64)
    ref_iv = (jnp.zeros((n_steps, 1), dtype=jnp.float64),)

    gibbs = build_gibbs(
        model.ssm,
        (model.gp,),
        n_particles,
        n_iter,
        dtype=jnp.float64,
        fused=False,
        n_chains=n_chains,
        chain_mesh=make_chain_mesh(n_chains),
    )
    key, key_g = jax.random.split(key)
    res = gibbs(key_g, Y, inputs, model.x0, model.p0, ref_state, ref_iv)
    assert res.states.shape == (n_chains, n_steps, n_iter, 1)
    assert np.all(np.isfinite(np.asarray(res.states)))
    assert np.abs(
        np.asarray(res.states[1:, :, -1, 0])
        - np.asarray(res.states[0, :, -1, 0])
    ).max() > 1e-3


def test_host_loop_chains_and_checkpoint_resume(tmp_path):
    """The host-loop sampler supports chains too: same leading-(C,) result
    layout, and a checkpointed run that is killed mid-chain resumes to a
    bitwise-identical result."""
    n_particles, n_steps, n_iter, n_chains = 30, 15, 8, 3
    cfg = toy.ToyConfig(n_particles=n_particles, n_steps=n_steps)
    model = toy.make_model(cfg)
    key = jax.random.key(7)
    key, key_sim = jax.random.split(key)
    _, Y = toy.simulate(key_sim, cfg, dtype=jnp.float64)
    inputs = jnp.zeros((n_steps, 0))
    ref_state = jnp.zeros((n_steps, 1), dtype=jnp.float64)
    ref_iv = (jnp.zeros((n_steps, 1), dtype=jnp.float64),)
    key, key_g = jax.random.split(key)

    gibbs = build_gibbs(
        model.ssm,
        (model.gp,),
        n_particles,
        n_iter,
        dtype=jnp.float64,
        fused=False,
        n_chains=n_chains,
    )
    args = (Y, inputs, model.x0, model.p0, ref_state, ref_iv)
    res = gibbs(key_g, *args)
    assert res.states.shape == (n_chains, n_steps, n_iter, 1)
    assert np.all(np.isfinite(np.asarray(res.states)))
    # chains start at the shared reference and diverge
    for c in range(n_chains):
        np.testing.assert_allclose(
            np.asarray(res.states[c, :, 0, :]), np.asarray(ref_state),
            rtol=1e-9,
        )
    assert np.abs(
        np.asarray(res.states[1:, :, -1, 0])
        - np.asarray(res.states[0, :, -1, 0])
    ).max() > 1e-3

    # interrupted checkpointed run resumes bitwise-identically
    ck = str(tmp_path / "chains.ckpt")

    class Stop(Exception):
        pass

    def killer(k, ref):
        if k == 5:
            raise Stop

    with pytest.raises(Stop):
        gibbs(key_g, *args, callback=killer, checkpoint_path=ck,
              checkpoint_every=2)
    res2 = gibbs(key_g, *args, checkpoint_path=ck, checkpoint_every=2)
    np.testing.assert_array_equal(
        np.asarray(res.states), np.asarray(res2.states)
    )

    # a single-chain checkpoint cannot resume a chains run
    gibbs1 = build_gibbs(
        model.ssm, (model.gp,), n_particles, n_iter,
        dtype=jnp.float64, fused=False,
    )
    ck1 = str(tmp_path / "single.ckpt")
    ref1 = (ref_state, ref_iv)
    with pytest.raises(Stop):
        gibbs1(key_g, Y, inputs, model.x0, model.p0, *ref1,
               callback=killer, checkpoint_path=ck1, checkpoint_every=2)
    with pytest.raises(ValueError, match="different run"):
        gibbs(key_g, *args, checkpoint_path=ck1)


@pytest.mark.skipif(
    not (
        os.environ.get("BIPK_PALLAS_INTERPRET")
        or os.environ.get("BIPK_TPU_TESTS")
    ),
    reason="exercises vmap over the fused Pallas kernels; needs a TPU "
    "backend or BIPK_PALLAS_INTERPRET=1",
)
def test_chains_through_pallas_kernels():
    """Chain-vmap composes with the fused Pallas kernels: the vehicle
    model (m=20 uses the tiled draw+update / factorize+project kernels)
    runs 2 chains x 2 sweeps through pallas_call's batching rule."""
    from bipk_tpu.models import vehicle as veh

    cfg = veh.VehicleConfig(t_end=4 * 0.02)
    model = veh.make_model(cfg)
    key = jax.random.key(0)
    key, ks = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(ks, cfg, dtype=jnp.float32)
    T = Y.shape[0]
    ref_state = jnp.zeros((T, 2), jnp.float32)
    ref_iv = (
        jnp.zeros((T, 1), jnp.float32),
        jnp.zeros((T, 1), jnp.float32),
    )
    g = jax.jit(
        build_gibbs(
            model.ssm, model.gps, 16, 2, dtype=jnp.float32, n_chains=2
        )
    )
    res = g(
        key,
        Y,
        inputs,
        jnp.asarray(model.x0, jnp.float32),
        jnp.asarray(model.p0, jnp.float32),
        ref_state,
        ref_iv,
    )
    assert res.states.shape == (2, T, 2, 2)
    assert np.isfinite(np.asarray(res.states)).all()


# ---- diagnostics unit tests (no sampler involved) ----


def test_split_rhat_iid_near_one():
    rng = np.random.default_rng(0)
    draws = rng.normal(size=(4, 500))
    r = float(diagnostics.split_rhat(draws))
    assert 0.99 < r < 1.02, r


def test_split_rhat_detects_mean_shift():
    rng = np.random.default_rng(1)
    draws = rng.normal(size=(4, 500))
    draws[0] += 3.0
    assert float(diagnostics.split_rhat(draws)) > 1.5


def test_split_rhat_detects_within_chain_trend():
    """Split halves catch a trend even when full-chain means agree."""
    rng = np.random.default_rng(2)
    trend = np.linspace(-3, 3, 500)
    draws = rng.normal(size=(4, 500)) + trend
    assert float(diagnostics.split_rhat(draws)) > 1.5


def test_rank_normalized_rhat_heavy_tails():
    """A scale (not location) difference between chains is invisible to
    location R-hat but caught by the folded variant; :func:`rhat` takes
    the max of both."""
    rng = np.random.default_rng(3)
    draws = rng.standard_cauchy(size=(4, 800))
    assert float(diagnostics.rhat(draws)) < 1.05
    draws_bad = draws.copy()
    draws_bad[0] *= 20.0
    assert float(diagnostics.rank_normalized_rhat(draws_bad, folded=True)) > 1.1
    assert float(diagnostics.rhat(draws_bad)) > 1.1


def test_ess_iid_near_full():
    rng = np.random.default_rng(4)
    draws = rng.normal(size=(4, 1000))
    e = float(diagnostics.ess_mean(draws))
    assert 2500 < e < 5500, e


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient a has tau = (1+a)/(1-a); check within 2x."""
    rng = np.random.default_rng(5)
    a = 0.9
    n, c = 20000, 4
    x = np.empty((c, n))
    for ci in range(c):
        e = rng.normal(size=n) * np.sqrt(1 - a * a)
        z = np.empty(n)
        z[0] = rng.normal()
        for t in range(1, n):
            z[t] = a * z[t - 1] + e[t]
        x[ci] = z
    tau_true = (1 + a) / (1 - a)  # 19
    e = float(diagnostics.ess_mean(x))
    expected = c * n / tau_true
    assert 0.5 * expected < e < 2.0 * expected, (e, expected)


def test_gibbs_chain_summary_too_short_reports_nan():
    """A run with < 4 post-burn-in draws per chain cannot be diagnosed;
    the summary reports NaNs instead of raising (a finished sampling run
    must never crash in its reporting step)."""
    rng = np.random.default_rng(8)
    short = rng.normal(size=(2, 10, 4, 1))
    out = diagnostics.gibbs_chain_summary((short,), n_burn=2)
    assert np.isnan(out[0]["rhat"]) and np.isnan(out[0]["ess"])
    assert out[0]["n_draws"] == 4 and not out[0]["stuck"]


def test_gibbs_chain_summary_flags_stuck_chains():
    """Constant draws (degenerate cSMC: every sweep returns the pinned
    reference) are reported as stuck, not as a NaN R-hat."""
    rng = np.random.default_rng(7)
    moving = rng.normal(size=(3, 10, 8, 1))
    stuck = np.full((3, 10, 8, 1), 0.5)
    out = diagnostics.gibbs_chain_summary((moving, stuck), n_burn=2)
    assert not out[0]["stuck"] and np.isfinite(out[0]["rhat"])
    assert out[1]["stuck"] and np.isnan(out[1]["rhat"])


def test_diagnostics_vector_quantities():
    rng = np.random.default_rng(6)
    draws = rng.normal(size=(4, 200, 3))
    r = np.asarray(diagnostics.split_rhat(draws))
    assert r.shape == (3,)
    e = np.asarray(diagnostics.ess_mean(draws))
    assert e.shape == (3,)
