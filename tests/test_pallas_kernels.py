"""Pallas kernels vs the portable XLA path.

The CPU suite exercises the XLA implementations; this module
cross-validates every Pallas kernel against them on realistic accumulated
statistics. Two ways to run it:

    # on TPU hardware (Mosaic lowering, the production configuration);
    # the shared conftest pins the suite to CPU, so run the module alone:
    BIPK_TPU_TESTS=1 python -m pytest tests/test_pallas_kernels.py -q

    # on any host via the Pallas interpreter (validates the kernel MATH
    # without TPU access; ~100x slower per op, same assertions):
    BIPK_PALLAS_INTERPRET=1 python -m pytest tests/test_pallas_kernels.py -q
"""

import os

import jax

if os.environ.get("BIPK_TPU_TESTS"):
    # undo the conftest's CPU pin and virtual-device flags before any
    # backend initialization (the host-device-count flag breaks the
    # remote TPU compile helper)
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "host_platform_device_count" not in f
    )
    jax.config.update("jax_platforms", None)
    # production TPU runs are f32; x64 (enabled by the shared conftest)
    # breaks Mosaic lowering of the kernels
    jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.ops import mniw


def _pallas_available():
    if os.environ.get("BIPK_PALLAS_INTERPRET"):
        return True
    if not os.environ.get("BIPK_TPU_TESTS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _pallas_available(),
    reason="Pallas kernels need a TPU backend or BIPK_PALLAS_INTERPRET=1",
)


@pytest.fixture(scope="module")
def nat_bl():
    key = jax.random.key(0)
    N, m, n = 1000, 20, 1
    phis = jax.random.normal(key, (N, 30, m), dtype=jnp.float32)
    ys = jax.random.normal(jax.random.key(1), (N, 30, n), dtype=jnp.float32)
    st = jax.jit(jax.vmap(jax.vmap(mniw.suff_stat)))(ys, phis)
    summed = jax.tree_util.tree_map(lambda s: jnp.sum(s, axis=1), st)
    prior = mniw.natural_from_standard(
        np.zeros((n, m), np.float32),
        np.eye(m, dtype=np.float32) * 2.0,
        np.eye(n, dtype=np.float32) * 1.5,
        5.0,
    )
    nat = jax.tree_util.tree_map(
        lambda p, s: p.astype(jnp.float32) + s, prior, summed
    )
    return mniw.to_batch_last(nat)


def test_factorize_matches_xla(nat_bl):
    f_x = jax.jit(lambda n: mniw.factorize_bl(n, use_pallas=False))(nat_bl)
    f_p = jax.jit(lambda n: mniw.factorize_bl(n, use_pallas=True))(nat_bl)
    np.testing.assert_allclose(f_p.chol, f_x.chol, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(f_p.white_T0, f_x.white_T0, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(f_p.row_scale, f_x.row_scale, rtol=1e-3, atol=1e-4)


def test_projection_matches_xla(nat_bl):
    f = jax.jit(lambda n: mniw.factorize_bl(n, use_pallas=True))(nat_bl)
    phi = jax.random.normal(jax.random.key(2), (20, 1000), dtype=jnp.float32)
    m_x = jax.jit(
        lambda f, p: mniw.factor_mean_at_bl(f, p, use_pallas=False)
    )(f, phi)
    m_p = jax.jit(
        lambda f, p: mniw.factor_mean_at_bl(f, p, use_pallas=True)
    )(f, phi)
    np.testing.assert_allclose(m_p, m_x, rtol=1e-4, atol=1e-4)


def test_log_base_measure_matches_xla(nat_bl):
    l_x = jax.jit(lambda n: mniw.log_base_measure_bl(n, use_pallas=False))(nat_bl)
    l_p = jax.jit(lambda n: mniw.log_base_measure_bl(n, use_pallas=True))(nat_bl)
    np.testing.assert_allclose(l_p, l_x, rtol=1e-4, atol=2e-2)


def _accumulated_packed(m, n, N=2048, seed=42):
    key = jax.random.key(seed)
    k1, k2, k3, _ = jax.random.split(key, 4)
    stats = mniw.suff_stat_bl(
        jax.random.normal(k2, (n, N), jnp.float32),
        jax.random.normal(k1, (m, N), jnp.float32),
    )
    for i in range(3 * m):
        kk = jax.random.fold_in(k3, i)
        stats = jax.tree_util.tree_map(
            lambda a, b: a + b,
            stats,
            mniw.suff_stat_bl(
                jax.random.normal(jax.random.fold_in(kk, 1), (n, N), jnp.float32),
                jax.random.normal(kk, (m, N), jnp.float32),
            ),
        )
    prior = mniw.MNIW(
        jnp.zeros((m, n), jnp.float32),
        jnp.eye(m, dtype=jnp.float32) * 2.0,
        jnp.eye(n, dtype=jnp.float32) * 3.0,
        jnp.asarray(5.0, jnp.float32),
    )
    return mniw.pack_stats_bl(stats), prior


@pytest.mark.parametrize("m,n", [(20, 1), (9, 1), (6, 2)])
def test_factorize_project_packed_matches_xla(m, n):
    S, prior = _accumulated_packed(m, n)
    phi = jax.random.normal(jax.random.key(3), (m, S.shape[-1]), jnp.float32)
    args = dict(prior=prior, lam=0.999, m=m, n=n)
    fp_p = mniw.factorize_project_packed_bl(S, phi, use_pallas=True, **args)
    fp_x = mniw.factorize_project_packed_bl(S, phi, use_pallas=False, **args)
    np.testing.assert_allclose(fp_p.mean, fp_x.mean, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        fp_p.col_scale, fp_x.col_scale, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        fp_p.row_scale, fp_x.row_scale, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        fp_p.logdet_T1, fp_x.logdet_T1, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        fp_p.logdet_Psi, fp_x.logdet_Psi, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(fp_p.df, fp_x.df, rtol=1e-6)


@pytest.mark.parametrize("m,n", [(20, 1), (9, 1), (6, 2), (41, 1)])
def test_draw_update_packed_matches_xla(m, n):
    """Same RNG stream on both paths; the draw may differ by f32
    cancellation noise (mean + scaled with opposite signs), so the value
    tolerance is loose while the deterministic log-dets stay tight."""
    S, prior = _accumulated_packed(m, n)
    phi = jax.random.normal(jax.random.key(3), (m, S.shape[-1]), jnp.float32)
    key = jax.random.key(11)
    args = dict(prior=prior, lam=0.999, m=m, n=n)
    Sp, yp, l1p, lpp = mniw.draw_update_packed_bl(
        key, S, phi, use_pallas=True, **args
    )
    Sx, yx, l1x, lpx = mniw.draw_update_packed_bl(
        key, S, phi, use_pallas=False, **args
    )
    np.testing.assert_allclose(yp, yx, rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(Sp, Sx, rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(l1p, l1x, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(lpp, lpx, rtol=2e-4, atol=2e-4)


def _sorted_ancestors(n_in, n_out, seed, concentration=0.5):
    """Realistic systematic-resampling ancestors: non-decreasing, uneven
    offspring counts (Dirichlet weights)."""
    from bipk_tpu.ops import resampling

    w = jax.random.dirichlet(
        jax.random.key(seed), jnp.full((n_in,), concentration, jnp.float32)
    )
    anc = resampling.systematic(jax.random.key(seed + 1), w)
    if n_out != n_in:
        # microbatch slice: a contiguous chunk of the sorted ancestors
        anc = anc[:n_out]
    return anc.astype(jnp.int32)


@pytest.mark.parametrize("m,n", [(20, 1), (9, 1), (6, 2)])
def test_draw_update_gather_matches_gather_then_draw(m, n):
    """Fused-gather kernel == XLA gather followed by the (already
    validated) fused draw/update kernel, same key — the gather itself is
    exact so the tolerance is zero against the same-path reference."""
    S, prior = _accumulated_packed(m, n)
    anc = _sorted_ancestors(S.shape[-1], S.shape[-1], seed=7)
    phi = jax.random.normal(jax.random.key(3), (m, anc.shape[0]), jnp.float32)
    key = jax.random.key(11)
    args = dict(prior=prior, lam=0.999, m=m, n=n)

    Sf, yf, l1f, lpf = mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, use_pallas=True, fused=True, **args
    )
    Sr, yr, l1r, lpr = mniw.draw_update_packed_bl(
        key, jnp.take(S, anc, axis=-1), phi, use_pallas=True, **args
    )
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
    np.testing.assert_array_equal(np.asarray(Sf), np.asarray(Sr))
    np.testing.assert_array_equal(np.asarray(l1f), np.asarray(l1r))
    np.testing.assert_array_equal(np.asarray(lpf), np.asarray(lpr))


def test_draw_update_gather_microbatch_out_lt_in():
    """N_out < N_in (microbatched chunk gathering from the full
    population) goes through the same kernel."""
    m, n = 9, 1
    S, prior = _accumulated_packed(m, n)
    anc = _sorted_ancestors(S.shape[-1], 1024, seed=13)
    phi = jax.random.normal(jax.random.key(5), (m, 1024), jnp.float32)
    key = jax.random.key(17)
    args = dict(prior=prior, lam=1.0, m=m, n=n)
    Sf, yf, l1f, lpf = mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, use_pallas=True, fused=True, **args
    )
    Sr, yr, l1r, lpr = mniw.draw_update_packed_bl(
        key, jnp.take(S, anc, axis=-1), phi, use_pallas=True, **args
    )
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
    np.testing.assert_array_equal(np.asarray(Sf), np.asarray(Sr))


def test_draw_update_gather_window_overflow_falls_back():
    """Ancestors whose span inside one output block exceeds the lane
    window (degenerate weights: one particle near 0 and one near the end
    get all the offspring) divert to the exact fallback via lax.cond and
    still produce the gathered reference result."""
    from bipk_tpu.ops import pallas_kernels as pk

    m, n = 9, 1
    # 64 source tiles: wider than the 32-tile contiguous window, so the
    # whole-source jump below can actually overflow it
    S, prior = _accumulated_packed(m, n, N=8192)
    n_in = S.shape[-1]
    # the jump from 0 to n_in-1 lands INSIDE output block 1, so that
    # block's ancestors span the whole source — far beyond the window
    half = 1024 + 512
    anc = jnp.concatenate(
        [jnp.zeros((half,), jnp.int32),
         jnp.full((n_in - half,), n_in - 1, jnp.int32)]
    )
    w, fits = pk.window_starts(anc, n_in)
    assert not bool(fits)
    phi = jax.random.normal(jax.random.key(5), (m, n_in), jnp.float32)
    key = jax.random.key(19)
    args = dict(prior=prior, lam=0.999, m=m, n=n)
    Sf, yf, l1f, lpf = mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, use_pallas=True, fused=True, **args
    )
    Sr, yr, l1r, lpr = mniw.draw_update_packed_bl(
        key, jnp.take(S, anc, axis=-1), phi, use_pallas=True, **args
    )
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
    np.testing.assert_array_equal(np.asarray(Sf), np.asarray(Sr))


@pytest.mark.parametrize("m,n", [(20, 1), (9, 1), (6, 2)])
def test_factor_reuse_draw_matches_refactorize(m, n):
    """The factor-consuming gather/draw kernel (factor emitted by the
    auxiliary kernel) is BITWISE identical to the refactorizing fused
    gather kernel: the auxiliary kernel ran the same panel-blocked
    Cholesky + substitution on the same inputs, so reusing L/white changes
    no arithmetic."""
    from bipk_tpu.ops import pallas_kernels as pk

    S, prior = _accumulated_packed(m, n)
    if not pk.supported_factor(m):
        pytest.skip("factor pair needs the tiled layout")
    anc = _sorted_ancestors(S.shape[-1], S.shape[-1], seed=23)
    N = anc.shape[0]
    phi_aux = jax.random.normal(jax.random.key(29), (m, N), jnp.float32)
    phi = jax.random.normal(jax.random.key(31), (m, N), jnp.float32)
    key = jax.random.key(37)
    args = dict(prior=prior, lam=0.999, m=m, n=n)

    fp, lw = mniw.factorize_project_packed_bl(
        S, phi_aux, use_pallas=True, emit_factor=True, **args
    )
    assert lw is not None and lw.shape == (m * (m + 1) // 2 + m * n, N)

    Sf, yf, l1f, lpf = mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, use_pallas=True, fused=True, factor=lw, **args
    )
    Sr, yr, l1r, lpr = mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, use_pallas=True, fused=True, **args
    )
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
    np.testing.assert_array_equal(np.asarray(Sf), np.asarray(Sr))
    np.testing.assert_array_equal(np.asarray(l1f), np.asarray(l1r))
    np.testing.assert_array_equal(np.asarray(lpf), np.asarray(lpr))

    # the emitting auxiliary kernel's small outputs match the plain one
    fp0 = mniw.factorize_project_packed_bl(
        S, phi_aux, use_pallas=True, **args
    )
    np.testing.assert_array_equal(np.asarray(fp.mean), np.asarray(fp0.mean))
    np.testing.assert_array_equal(
        np.asarray(fp.logdet_T1), np.asarray(fp0.logdet_T1)
    )


def _degenerate_sorted_ancestors(n_in, seed, n_heavy=12, key_frac=0.02):
    """Vehicle-regime ancestors: a few heavy particles get long offspring
    runs, a sprinkle of singletons in the wide gaps between them — blocks
    SPAN most of the source while touching few distinct tiles."""
    key = jax.random.key(seed)
    kh, ks, kr = jax.random.split(key, 3)
    w = jnp.zeros((n_in,), jnp.float32)
    heavy = jax.random.choice(kh, n_in, (n_heavy,), replace=False)
    w = w.at[heavy].set(jax.random.uniform(kr, (n_heavy,)) + 0.5)
    single = jax.random.choice(ks, n_in, (int(n_in * key_frac),), replace=False)
    w = w.at[single].add(1.2 / n_in)
    from bipk_tpu.ops import resampling

    return resampling.systematic(jax.random.key(seed + 1), w).astype(jnp.int32)


def test_dedup_plan_matches_numpy():
    from bipk_tpu.ops import pallas_kernels as pk

    n_in = 4096
    anc = _degenerate_sorted_ancestors(n_in, seed=3)
    block, wt = 1024, 16
    fits = bool(pk.dedup_fits(anc, block, wt))
    local, plan = jax.jit(pk.dedup_plan, static_argnums=(1, 2, 3))(
        anc, block, wt, n_in // 128
    )
    a = np.asarray(anc).reshape(-1, block)
    nb = a.shape[0]
    tids = np.asarray(plan)[: nb * wt].reshape(nb, wt)
    dk = np.asarray(plan)[nb * wt:]
    max_dk = 0
    for k in range(nb):
        at = a[k] >> 7
        uniq, inv = np.unique(at, return_inverse=True)
        max_dk = max(max_dk, len(uniq))
        assert dk[k] == len(uniq)
        want_local = inv * 128 + (a[k] & 127)
        np.testing.assert_array_equal(
            np.asarray(local).reshape(nb, block)[k], want_local
        )
        np.testing.assert_array_equal(tids[k, : len(uniq)], uniq)
        # pad slots forward-fill from the previous block (slot ids must
        # not change across blocks, else the pad refs re-fire their DMA)
        if k > 0:
            np.testing.assert_array_equal(
                tids[k, len(uniq):], tids[k - 1, len(uniq):]
            )
    assert fits == (max_dk <= wt)


def test_draw_update_dedup_gather_matches_gather_then_draw():
    """The dedup-window kernel (degenerate-weight regime) is bitwise
    identical to XLA gather + fused draw/update: wide-span blocks that
    can never fit the contiguous window are covered by their distinct
    tiles. Exercises the FULL dispatch (contiguous window must NOT fit,
    dedup must) and the kernel directly."""
    from bipk_tpu.ops import pallas_kernels as pk

    m, n = 20, 1
    S, prior = _accumulated_packed(m, n, N=16384)
    n_in = S.shape[-1]
    anc = _degenerate_sorted_ancestors(n_in, seed=9)
    block, wt, use_cs = pk.gather_plan(m, n, n_in, S.dtype)
    assert not use_cs
    _, fits = pk.window_starts(anc, n_in, block=block, window_tiles=wt)
    assert not bool(fits), "want the contiguous window to overflow"
    wdt = pk.dedup_window_tiles(n_in)
    assert bool(pk.dedup_fits(anc, block, wdt)), "want the dedup path"

    phi = jax.random.normal(jax.random.key(5), (m, n_in), jnp.float32)
    key = jax.random.key(29)
    args = dict(prior=prior, lam=0.999, m=m, n=n)
    os.environ["BIPK_DEDUP_GATHER"] = "1"
    try:
        Sf, yf, l1f, lpf = mniw.draw_update_gather_packed_bl(
            key, S, anc, phi, use_pallas=True, fused=True, **args
        )
    finally:
        del os.environ["BIPK_DEDUP_GATHER"]
    Sr, yr, l1r, lpr = mniw.draw_update_packed_bl(
        key, jnp.take(S, anc, axis=-1), phi, use_pallas=True, **args
    )
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
    np.testing.assert_array_equal(np.asarray(l1f), np.asarray(l1r))
    np.testing.assert_array_equal(np.asarray(lpf), np.asarray(lpr))
    if pk._INTERPRET:
        # interpret mode compiles the two kernels as separate XLA CPU
        # programs, and XLA is free to fma-contract the statistics update
        # `raw*lam + phi_i*phi_j` in one and not the other. The draws and
        # log-determinants above are exact, so only operand-scale fma
        # noise remains (under cancellation it exceeds result-ulp scale);
        # on real TPU hardware Mosaic compiles both identically and the
        # comparison is bitwise (verified on v5e).
        a, b = np.asarray(Sf), np.asarray(Sr)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3)
    else:
        np.testing.assert_array_equal(np.asarray(Sf), np.asarray(Sr))


def test_dedup_gather_overflow_diverts_to_xla_fallback():
    """A block touching more distinct tiles than the dedup window still
    produces the exact gathered reference result (3rd dispatch tier)."""
    from bipk_tpu.ops import pallas_kernels as pk

    m, n = 9, 1
    S, prior = _accumulated_packed(m, n, N=8192)
    n_in = S.shape[-1]
    # one output block fed by > wdt distinct tiles: ancestors stride
    # every other tile across the whole source inside block 0
    wdt = pk.dedup_window_tiles(n_in)
    stride = jnp.arange(1024, dtype=jnp.int32) * (n_in // 1024)
    rest = jnp.full((n_in - 1024,), n_in - 1, jnp.int32)
    anc = jnp.concatenate([stride, rest])
    assert not bool(pk.dedup_fits(anc, 1024, wdt))
    phi = jax.random.normal(jax.random.key(5), (m, n_in), jnp.float32)
    key = jax.random.key(31)
    args = dict(prior=prior, lam=1.0, m=m, n=n)
    os.environ["BIPK_DEDUP_GATHER"] = "1"
    try:
        Sf, yf, l1f, lpf = mniw.draw_update_gather_packed_bl(
            key, S, anc, phi, use_pallas=True, fused=True, **args
        )
    finally:
        del os.environ["BIPK_DEDUP_GATHER"]
    Sr, yr, l1r, lpr = mniw.draw_update_packed_bl(
        key, jnp.take(S, anc, axis=-1), phi, use_pallas=True, **args
    )
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
    np.testing.assert_array_equal(np.asarray(Sf), np.asarray(Sr))


def test_merged_cond_dispatch_parts_bitwise():
    """``_parts=True`` (the BIPK_MERGED_COND=1 multi-GP merged dispatch:
    one lax.cond shared by every GP, since all GPs share one ancestor
    vector and hence one ``fits``) returns branch closures whose merged
    cond is bitwise-identical to the per-GP conditional dispatch."""
    m, n = 9, 1
    S, prior = _accumulated_packed(m, n)
    anc = _sorted_ancestors(S.shape[-1], S.shape[-1], seed=19)
    phi = jax.random.normal(
        jax.random.key(23), (m, anc.shape[0]), jnp.float32
    )
    key = jax.random.key(29)
    args = dict(prior=prior, lam=0.999, m=m, n=n, use_pallas=True)

    parts = mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, fused=True, _parts=True, **args
    )
    assert parts is not None
    fits, fused_fn, fallback_fn = parts
    merged = jax.lax.cond(fits, fused_fn, fallback_fn, None)
    ref = mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, fused=True, **args
    )
    for a, b in zip(merged, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the separate-gather and non-Pallas paths refuse to merge
    assert mniw.draw_update_gather_packed_bl(
        key, S, anc, phi, fused=False, _parts=True, **args
    ) is None
