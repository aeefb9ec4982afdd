"""Unit tests for resampling + ancestry (bipk_tpu.ops.resampling)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.ops import resampling


def test_systematic_unbiased_counts():
    """Offspring counts of systematic resampling are within 1 of N*w."""
    w = jnp.asarray([0.1, 0.4, 0.05, 0.25, 0.2])
    n = w.shape[0]
    for seed in range(20):
        idx = resampling.systematic(jax.random.key(seed), w)
        counts = np.bincount(np.asarray(idx), minlength=n)
        np.testing.assert_array_less(np.abs(counts - n * np.asarray(w)), 1.0 + 1e-9)


def test_systematic_zero_weights_uniform_fallback():
    idx = resampling.systematic(jax.random.key(0), jnp.zeros(8))
    assert idx.shape == (8,)
    assert np.all(np.asarray(idx) >= 0) and np.all(np.asarray(idx) < 8)


def test_systematic_degenerate_single_weight():
    w = jnp.zeros(16).at[5].set(1.0)
    idx = resampling.systematic(jax.random.key(1), w)
    np.testing.assert_array_equal(np.asarray(idx), 5)


def test_categorical_distribution():
    w = jnp.asarray([0.2, 0.5, 0.3])
    keys = jax.random.split(jax.random.key(2), 20_000)
    draws = jax.vmap(lambda k: resampling.categorical_from_weights(k, w))(keys)
    freq = np.bincount(np.asarray(draws), minlength=3) / 20_000
    np.testing.assert_allclose(freq, np.asarray(w), atol=0.02)


def test_ess_bounds():
    n = 64
    uniform = jnp.zeros(n)
    np.testing.assert_allclose(
        float(resampling.effective_sample_size(uniform)), n, rtol=1e-6
    )
    degenerate = jnp.full((n,), -1e6).at[0].set(0.0)
    np.testing.assert_allclose(
        float(resampling.effective_sample_size(degenerate)), 1.0, rtol=1e-3
    )


def _host_reconstruct(particles, ancestry, idx):
    """Straightforward host-side reference implementation."""
    T = particles.shape[0]
    traj = np.zeros((T,) + particles.shape[2:])
    cur = int(idx)
    traj[-1] = particles[-1, cur]
    for t in range(T - 2, -1, -1):
        cur = int(ancestry[t, cur])
        traj[t] = particles[t, cur]
    return traj


def test_reconstruct_trajectory_matches_host():
    rng = np.random.default_rng(0)
    T, N, d = 12, 7, 3
    particles = rng.standard_normal((T, N, d))
    ancestry = rng.integers(0, N, size=(T - 1, N))
    idx = 4
    (got,), _ = resampling.reconstruct_trajectory(
        (jnp.asarray(particles),), jnp.asarray(ancestry), idx
    )
    np.testing.assert_allclose(
        np.asarray(got), _host_reconstruct(particles, ancestry, idx)
    )


def test_reconstruct_trajectory_pytree():
    rng = np.random.default_rng(1)
    T, N = 6, 4
    a = rng.standard_normal((T, N, 2))
    b = rng.standard_normal((T, N, 1))
    ancestry = rng.integers(0, N, size=(T - 1, N))
    (got_a, (got_b,)), indices = resampling.reconstruct_trajectory(
        (jnp.asarray(a), (jnp.asarray(b),)), jnp.asarray(ancestry), 2
    )
    np.testing.assert_allclose(np.asarray(got_a), _host_reconstruct(a, ancestry, 2))
    np.testing.assert_allclose(np.asarray(got_b), _host_reconstruct(b, ancestry, 2))
    assert indices.shape == (T,)


def test_reconstruct_trajectory_bl_matches_batch_first():
    rng = np.random.default_rng(2)
    T, N, d = 12, 7, 3
    particles = rng.standard_normal((T, N, d))
    ancestry = rng.integers(0, N, size=(T - 1, N))
    idx = 5
    (want,), _ = resampling.reconstruct_trajectory(
        (jnp.asarray(particles),), jnp.asarray(ancestry), idx
    )
    (got,), indices = resampling.reconstruct_trajectory_bl(
        (jnp.asarray(particles).swapaxes(1, 2),), jnp.asarray(ancestry), idx
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    assert indices.shape == (T,)


def test_systematic_matches_searchsorted_reference():
    """Scatter-based systematic == searchsorted-based, up to fp ties."""
    for seed in range(10):
        key = jax.random.key(seed)
        w = jax.nn.softmax(jax.random.normal(key, (257,)) * 2.0)
        a = np.asarray(resampling.systematic(key, w))
        b = np.asarray(resampling.systematic_searchsorted(key, w))
        assert np.mean(a != b) < 0.02, (seed, np.mean(a != b))
        # identical offspring counts (the statistic that matters)
        ca = np.bincount(a, minlength=257)
        cb = np.bincount(b, minlength=257)
        assert np.abs(ca - cb).max() <= 1


def test_systematic_degenerate_mass_at_end():
    w = jnp.zeros(64).at[63].set(1.0)
    idx = resampling.systematic(jax.random.key(0), w)
    np.testing.assert_array_equal(np.asarray(idx), 63)


def test_systematic_degenerate_mass_at_start():
    w = jnp.zeros(64).at[0].set(1.0)
    idx = resampling.systematic(jax.random.key(0), w)
    np.testing.assert_array_equal(np.asarray(idx), 0)


def test_systematic_pallas_kernel_matches_xla():
    """The fused Pallas ancestors (interpret mode on CPU) match the XLA
    closed-form-offspring path up to CDF-rounding ties: sorted output,
    per-input offspring counts within 1, >98% identical slots."""
    from bipk_tpu.ops import pallas_kernels as pk

    if not pk.enabled():
        import pytest

        pytest.skip("pallas kernels disabled")
    for n in (256, 300, 1024, 4096):
        for seed in range(3):
            ka, kb = jax.random.split(jax.random.key(seed * 11 + 1))
            conc = [2.0, 8.0, 0.1][seed]
            w = jax.nn.softmax(jax.random.normal(ka, (n,)) * conc)
            u = jax.random.uniform(kb, dtype=jnp.float32)
            got = np.asarray(pk.systematic_ancestors_blocks(w, u, n))
            # f64 exact reference for the same (w, u)
            wd = np.asarray(w, np.float64)
            cdf = np.cumsum(wd / wd.sum())
            cc = np.clip(np.ceil(n * cdf - float(u)).astype(np.int64), 0, n)
            want = np.clip(
                np.searchsorted(cc, np.arange(n), side="right"), 0, n - 1
            )
            assert np.all(np.diff(got) >= 0), (n, seed)
            assert got.shape == (n,) and got.dtype == np.int32
            cg = np.bincount(got, minlength=n)
            cw = np.bincount(want, minlength=n)
            assert np.abs(cg - cw).max() <= 1, (n, seed)
            assert np.mean(got != want) < 0.02, (n, seed)


def test_systematic_pallas_kernel_large_n_ceiling():
    """Offspring-count parity at the kernel's supported ceiling
    (N = 131072): the f32 MXU-matmul prefix-sum CDF accumulates rounding
    that grows with N — slot mismatches rise, but every input's offspring
    count must stay within 1 of the f64 closed form."""
    import pytest

    from bipk_tpu.ops import pallas_kernels as pk

    if not pk.enabled():
        pytest.skip("pallas kernels disabled")
    if os.environ.get("BIPK_SKIP_SLOW_INTERPRET") and pk._INTERPRET:
        pytest.skip("interpret-mode large-N case skipped by env")
    n = 131072
    assert pk.supported_resample(n)
    ka, kb = jax.random.split(jax.random.key(7))
    w = jax.nn.softmax(jax.random.normal(ka, (n,)) * 4.0)
    u = jax.random.uniform(kb, dtype=jnp.float32)
    got = np.asarray(pk.systematic_ancestors_blocks(w, u, n))
    wd = np.asarray(w, np.float64)
    cdf = np.cumsum(wd / wd.sum())
    cc = np.clip(np.ceil(n * cdf - float(u)).astype(np.int64), 0, n)
    want = np.clip(np.searchsorted(cc, np.arange(n), side="right"), 0, n - 1)
    assert np.all(np.diff(got) >= 0)
    cg = np.bincount(got, minlength=n)
    cw = np.bincount(want, minlength=n)
    assert np.abs(cg - cw).max() <= 1


def test_systematic_pallas_degenerate():
    from bipk_tpu.ops import pallas_kernels as pk

    if not pk.enabled():
        import pytest

        pytest.skip("pallas kernels disabled")
    n = 512
    w = jnp.zeros(n).at[n - 1].set(1.0)
    got = np.asarray(
        pk.systematic_ancestors_blocks(w, jnp.float32(0.37), n)
    )
    np.testing.assert_array_equal(got, n - 1)
    w0 = jnp.zeros(n).at[0].set(1.0)
    got0 = np.asarray(
        pk.systematic_ancestors_blocks(w0, jnp.float32(0.37), n)
    )
    np.testing.assert_array_equal(got0, 0)
