"""Multi-chip tests on a simulated 8-device CPU mesh.

Validates that the particle-sharded APF (psum weight normalization + local
systematic resampling) matches the single-chip path statistically and that
the mesh program compiles and executes with real collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.algorithms import build_apf
from bipk_tpu.models import toy
from bipk_tpu.parallel.mesh import particle_mesh
from bipk_tpu.parallel.sharded import build_sharded_apf

# multi-minute on the 1-vCPU CI host (mesh compiles, GSPMD,
# subprocess fixtures); excluded from the core tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return particle_mesh(8)


@pytest.fixture(scope="module")
def toy_setup():
    cfg = toy.ToyConfig(n_particles=256, n_steps=30)
    model = toy.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    X, Y = toy.simulate(key_sim, cfg, dtype=jnp.float64)
    inputs = jnp.zeros((cfg.n_steps, 0))
    return cfg, model, X, Y, inputs, key


def test_sharded_apf_runs_and_is_finite(mesh8, toy_setup):
    cfg, model, X, Y, inputs, key = toy_setup
    run = jax.jit(
        build_sharded_apf(
            model.ssm, (model.gp,), cfg.n_particles, mesh8, 1.0,
            dtype=jnp.float64,
        )
    )
    res = run(key, Y, inputs, model.x0, model.p0)
    assert res.state_mean.shape == (cfg.n_steps, 1)
    assert res.final_state.shape == (cfg.n_particles, 1)
    assert np.all(np.isfinite(np.asarray(res.state_mean)))
    assert np.all(np.isfinite(np.asarray(res.final_log_weights)))
    # the final particles actually live sharded on the mesh
    assert len(res.final_state.sharding.device_set) == 8
    # ESS within bounds and healthy
    ess = np.asarray(res.ess)
    assert np.all(ess >= 1.0) and np.all(ess <= cfg.n_particles + 1e-6)
    # local (per-shard) resampling retains shard-mass offsets in the
    # weights, so the global ESS sits below the single-chip equivalent
    assert ess[1:].mean() > 0.1 * cfg.n_particles


def test_sharded_matches_single_chip_statistics(mesh8, toy_setup):
    """Seed-replicated two-sample z-test: the sharded local-resampling
    estimator and the single-chip global-systematic estimator target the
    same posterior expectations.

    For K independent seeds each scheme produces scalar statistics
    (time-averaged posterior interface-variable mean; trace of the final
    weighted T1). The difference of the two sample means is compared
    against its own measured Monte-Carlo standard error — a calibrated
    bound, unlike the earlier fixed tolerances which only excluded gross
    disagreement."""
    cfg, model, X, Y, inputs, key = toy_setup
    K = 8

    sharded = jax.jit(
        build_sharded_apf(
            model.ssm, (model.gp,), cfg.n_particles, mesh8, 1.0,
            dtype=jnp.float64,
        )
    )
    single = jax.jit(
        build_apf(model.ssm, (model.gp,), cfg.n_particles, 1.0,
                  dtype=jnp.float64)
    )

    iv_s, iv_1, tr_s, tr_1 = [], [], [], []
    for s in range(K):
        key_s = jax.random.fold_in(key, 1000 + s)
        res_s = sharded(key_s, Y, inputs, model.x0, model.p0)
        res_1 = single(key_s, Y, inputs, model.x0, model.p0)
        iv_s.append(float(jnp.mean(res_s.int_var_mean[0][10:, 0])))
        mean_1 = jnp.einsum("tn,tnd->td", res_1.weights, res_1.int_vars[0])
        iv_1.append(float(jnp.mean(mean_1[10:, 0])))
        tr_s.append(float(jnp.trace(res_s.stats_mean[0].T1[-1])))
        w = res_1.weights[-1]
        tr_1.append(float(jnp.trace(
            jnp.einsum("n...,n->...", res_1.final_stats[0].T1, w)
        )))

    for name, a, b in (("iv_mean", iv_s, iv_1), ("tr_T1", tr_s, tr_1)):
        a, b = np.asarray(a), np.asarray(b)
        se = np.sqrt((a.var(ddof=1) + b.var(ddof=1)) / K)
        z = abs(a.mean() - b.mean()) / max(se, 1e-12)
        # 4 sigma with K=8 replicates: fails with prob < 1e-4 under H0
        assert z < 4.0, (name, z, a.mean(), b.mean(), se)


def test_exact_global_systematic_matches_single_chip(mesh8):
    """The mesh-distributed exact scheme reproduces the single-chip global
    systematic resampler's ancestor vector EXACTLY for the same key."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from bipk_tpu.ops import resampling
    from bipk_tpu.parallel import global_resampling as gr
    from bipk_tpu.parallel.mesh import PARTICLE_AXIS

    for seed in (0, 1, 2, 3):
        key_w, key_r = jax.random.split(jax.random.key(seed))
        n = 128
        lw = 2.0 * jax.random.normal(key_w, (n,), dtype=jnp.float64)
        w = jax.nn.softmax(lw)
        anc_single = resampling.systematic(key_r, w)

        fn = shard_map(
            lambda k, wl: gr.global_systematic_slice(k, wl, PARTICLE_AXIS, 8),
            mesh=mesh8,
            in_specs=(P(), P(PARTICLE_AXIS)),
            out_specs=P(PARTICLE_AXIS),
            check_vma=False,
        )
        anc_sharded = jax.jit(fn)(key_r, w)
        np.testing.assert_array_equal(
            np.asarray(anc_sharded), np.asarray(anc_single), err_msg=f"seed {seed}"
        )


def test_ring_redistribute_matches_global_gather(mesh8):
    """Ring payload redistribution == a global gather, for arbitrary
    (not just sorted) global ancestor indices and 1/2/3-D payloads."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from bipk_tpu.parallel import global_resampling as gr
    from bipk_tpu.parallel.mesh import PARTICLE_AXIS

    n = 128
    k1, k2, k3, k4 = jax.random.split(jax.random.key(11), 4)
    p1 = jax.random.normal(k1, (n,), dtype=jnp.float64)
    p2 = jax.random.normal(k2, (5, n), dtype=jnp.float64)
    p3 = jax.random.normal(k3, (3, 4, n), dtype=jnp.float64)
    anc = jax.random.randint(k4, (n,), 0, n, dtype=jnp.int32)

    fn = shard_map(
        lambda a, q1, q2, q3: gr.ring_redistribute(
            (q1, q2, q3), a, PARTICLE_AXIS, 8
        ),
        mesh=mesh8,
        in_specs=(
            P(PARTICLE_AXIS),
            P(PARTICLE_AXIS),
            P(None, PARTICLE_AXIS),
            P(None, None, PARTICLE_AXIS),
        ),
        out_specs=(
            P(PARTICLE_AXIS),
            P(None, PARTICLE_AXIS),
            P(None, None, PARTICLE_AXIS),
        ),
        check_vma=False,
    )
    o1, o2, o3 = jax.jit(fn)(anc, p1, p2, p3)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(p1)[anc])
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(p2)[:, anc])
    np.testing.assert_array_equal(np.asarray(o3), np.asarray(p3)[:, :, anc])


def test_sharded_apf_exact_mode(mesh8, toy_setup):
    """Exact-resampling sharded APF runs on the mesh and tracks the
    single-chip posterior."""
    cfg, model, X, Y, inputs, key = toy_setup
    run = jax.jit(
        build_sharded_apf(
            model.ssm, (model.gp,), cfg.n_particles, mesh8, 1.0,
            dtype=jnp.float64, resampling_scheme="exact",
        )
    )
    res = run(key, Y, inputs, model.x0, model.p0)
    assert np.all(np.isfinite(np.asarray(res.state_mean)))
    ess = np.asarray(res.ess)
    assert np.all(ess >= 1.0) and np.all(ess <= cfg.n_particles + 1e-6)
    # exact global resampling has no shard-mass weight offsets, so ESS
    # should be healthy (like the single-chip path)
    assert ess[1:].mean() > 0.3 * cfg.n_particles
    # posterior interface-variable mean tracks the latent state
    iv = np.asarray(res.int_var_mean[0][5:, 0])
    rmse = np.sqrt(np.mean((iv - np.asarray(X)[5:, 0]) ** 2))
    assert rmse < 3.0, rmse


def test_chunked_sharded_apf_matches_statistics(mesh8, toy_setup):
    """Microbatched (chunked) execution is statistically equivalent to the
    unchunked sharded sweep (different RNG stream, same estimator)."""
    cfg, model, X, Y, inputs, key = toy_setup
    run_c = jax.jit(
        build_sharded_apf(
            model.ssm, (model.gp,), cfg.n_particles, mesh8, 1.0,
            dtype=jnp.float64, chunk_size=8,
        )
    )
    res = run_c(key, Y, inputs, model.x0, model.p0)
    assert np.all(np.isfinite(np.asarray(res.state_mean)))
    ess = np.asarray(res.ess)
    assert np.all(ess >= 1.0) and np.all(ess <= cfg.n_particles + 1e-6)
    iv = np.asarray(res.int_var_mean[0][5:, 0])
    rmse = np.sqrt(np.mean((iv - np.asarray(X)[5:, 0]) ** 2))
    assert rmse < 3.0, rmse
    # result contract: stats_mean in matrix form, final_stats batch-last
    assert res.stats_mean[0].T1.shape == (
        cfg.n_steps, cfg.n_basis, cfg.n_basis
    )
    assert res.final_stats[0].T1.shape == (
        cfg.n_basis, cfg.n_basis, cfg.n_particles
    )


def test_dryrun_multichip():
    import __graft_entry__ as ge

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    ge.dryrun_multichip(8)


def test_gspmd_gibbs_on_mesh(mesh8, toy_setup):
    """GSPMD-partitioned PGAS (mesh-constrained cSMC) runs on 8 devices and
    recovers the same posterior as the unsharded sampler statistically."""
    from bipk_tpu.algorithms import build_apf as _build_apf, build_gibbs
    from bipk_tpu.utils.matio import sample_reference_trajectory
    from bipk_tpu.ops import mniw
    from bipk_tpu.models import toy as toy_mod

    cfg, model, X, Y, inputs, key = toy_setup
    apf = jax.jit(
        _build_apf(model.ssm, (model.gp,), cfg.n_particles, 1.0,
                   dtype=jnp.float64)
    )
    key, key_a, key_t = jax.random.split(key, 3)
    res = apf(key_a, Y, inputs, model.x0, model.p0)
    ref_state, ref_iv = sample_reference_trajectory(key_t, res)

    # host-loop mode: compiles a single mesh-partitioned sweep (the fused
    # scan-of-scans is too heavy for the 1-core CI simulator)
    gibbs = build_gibbs(
        model.ssm, (model.gp,), cfg.n_particles, 12,
        dtype=jnp.float64, mesh=mesh8, fused=False,
    )
    key, key_g = jax.random.split(key)
    out = gibbs(key_g, Y, inputs, model.x0, model.p0, ref_state, ref_iv)
    assert out.states.shape == (cfg.n_steps, 12, 1)
    assert np.all(np.isfinite(np.asarray(out.states)))
    assert np.all(np.isfinite(np.asarray(out.log_likelihood)))
    # chain moves and the interface variables track the latent state
    iv_mean = np.asarray(out.int_vars[0][:, 6:, 0]).mean(axis=1)
    rmse = np.sqrt(np.mean((iv_mean[5:] - np.asarray(X)[5:, 0]) ** 2))
    assert rmse < 3.0, rmse


def test_gspmd_gibbs_fused_on_mesh(mesh8):
    """The FUSED scan-of-scans Gibbs sampler — one dispatch for the whole
    chain — compiles and runs partitioned over 8 devices.

    Uses a reduced basis count so the single fused XLA program stays within
    what the 1-core CI simulator can compile; the host-loop variant at full
    size is covered by test_gspmd_gibbs_on_mesh."""
    from bipk_tpu.algorithms import build_apf as _build_apf, build_gibbs
    from bipk_tpu.models import toy as toy_mod
    from bipk_tpu.utils.matio import sample_reference_trajectory

    cfg = toy_mod.ToyConfig(n_basis=12, n_particles=64, n_steps=16)
    model = toy_mod.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    X, Y = toy_mod.simulate(key_sim, cfg, dtype=jnp.float64)
    inputs = jnp.zeros((cfg.n_steps, 0))

    apf = jax.jit(
        _build_apf(model.ssm, (model.gp,), cfg.n_particles, 1.0,
                   dtype=jnp.float64)
    )
    key, key_a, key_t = jax.random.split(key, 3)
    res = apf(key_a, Y, inputs, model.x0, model.p0)
    ref_state, ref_iv = sample_reference_trajectory(key_t, res)

    gibbs = jax.jit(
        build_gibbs(
            model.ssm, (model.gp,), cfg.n_particles, 8,
            dtype=jnp.float64, mesh=mesh8, fused=True,
        )
    )
    key, key_g = jax.random.split(key)
    out = gibbs(key_g, Y, inputs, model.x0, model.p0, ref_state, ref_iv)
    assert out.states.shape == (cfg.n_steps, 8, 1)
    assert np.all(np.isfinite(np.asarray(out.states)))
    assert np.all(np.isfinite(np.asarray(out.log_likelihood)))
    # the chain moves
    diffs = np.abs(np.diff(np.asarray(out.states[:, :, 0]), axis=1)).mean(0)
    assert np.all(diffs > 1e-6), diffs.min()


def test_windowed_sharded_apf_matches_single_dispatch(mesh8, toy_setup):
    """Windowed dispatch (carry passed between <=window-step shard_map
    calls) reproduces the single-dispatch sweep: the RNG key table is
    identical by construction, so per-step moments agree to rounding."""
    cfg, model, X, Y, inputs, key = toy_setup
    kwargs = dict(dtype=jnp.float64)
    run_full = jax.jit(
        build_sharded_apf(
            model.ssm, (model.gp,), cfg.n_particles, mesh8, 1.0, **kwargs
        )
    )
    run_win = build_sharded_apf(
        model.ssm, (model.gp,), cfg.n_particles, mesh8, 1.0,
        window=7, **kwargs  # T-1=23 -> windows of 7,7,7,2
    )
    rf = run_full(key, Y, inputs, model.x0, model.p0)
    rw = run_win(key, Y, inputs, model.x0, model.p0)
    np.testing.assert_allclose(
        np.asarray(rw.state_mean), np.asarray(rf.state_mean),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(rw.ess), np.asarray(rf.ess), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(rw.final_log_weights),
        np.asarray(rf.final_log_weights), rtol=1e-9, atol=1e-9,
    )
    for a, b in zip(rw.final_stats, rf.final_stats):
        np.testing.assert_allclose(
            np.asarray(a.T1), np.asarray(b.T1), rtol=1e-9, atol=1e-9
        )


def test_blocked_carry_bitwise_matches_flat():
    """The opt-in blocked (rows, nb, 128) statistics carry is bitwise
    identical to the flat (rows, N) carry (same RNG, same kernels — only
    the scan-carry layout differs). Runs under the Pallas interpreter so
    the kernels actually execute on this CPU host."""
    import os

    import pytest

    if not os.environ.get("BIPK_PALLAS_INTERPRET"):
        pytest.skip("needs BIPK_PALLAS_INTERPRET=1 (kernel layouts)")
    from bipk_tpu.models import vehicle as veh
    from bipk_tpu.parallel.mesh import particle_mesh
    from bipk_tpu.parallel.sharded import build_sharded_apf

    cfg = veh.VehicleConfig(t_end=4 * 0.02)
    model = veh.make_model(cfg)
    key = jax.random.key(0)
    _, Y, _, _, inputs = veh.simulate(key, cfg, dtype=jnp.float32)
    outs = {}
    for blocked in (False, True):
        run = jax.jit(
            build_sharded_apf(
                model.ssm, model.gps, 1024, particle_mesh(1),
                forgetting_factor=cfg.forgetting_factor,
                dtype=jnp.float32, blocked_carry=blocked,
            )
        )
        outs[blocked] = run(
            key, Y, inputs,
            jnp.asarray(model.x0, jnp.float32),
            jnp.asarray(model.p0, jnp.float32),
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[False]),
        jax.tree_util.tree_leaves(outs[True]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_single_device_fast_path_bitwise_matches_shardmap(toy_setup):
    """On a 1-device mesh ``build_sharded_apf`` skips shard_map and
    lowers the collectives to identities (round-5 headline lever:
    28.3 -> 30.1M psps on the separate-gather configuration). The fast
    path pins ``axis_index`` to 0 — the same RNG fold-in shard 0 of the
    mesh run uses — so the result must be BITWISE identical to the
    1-device shard_map program (``BIPK_FORCE_SHARDMAP=1``)."""
    import os

    cfg, model, X, Y, inputs, key = toy_setup

    def build():
        return jax.jit(
            build_sharded_apf(
                model.ssm, (model.gp,), cfg.n_particles,
                particle_mesh(1), 1.0, dtype=jnp.float64,
            )
        )

    os.environ["BIPK_FORCE_SHARDMAP"] = "1"
    try:
        res_sm = build()(key, Y, inputs, model.x0, model.p0)
    finally:
        del os.environ["BIPK_FORCE_SHARDMAP"]
    res_fast = build()(key, Y, inputs, model.x0, model.p0)
    for a, b in zip(
        jax.tree_util.tree_leaves(res_sm),
        jax.tree_util.tree_leaves(res_fast),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
