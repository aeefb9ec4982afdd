"""Unit tests for the MNIW conjugate algebra (bipk_tpu.ops.mniw)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.ops import mniw


def _random_prior(key, m=5, n=2, df=8.0):
    k1, k2 = jax.random.split(key)
    mean = jax.random.normal(k1, (n, m), dtype=jnp.float64)
    w = jax.random.normal(k2, (m, m + 2), dtype=jnp.float64)
    col_cov = w @ w.T / (m + 2) + 0.5 * jnp.eye(m)
    row_scale = jnp.eye(n) * 1.7
    return mean, col_cov, row_scale, jnp.float64(df)


def test_natural_standard_roundtrip():
    mean, col_cov, row_scale, df = _random_prior(jax.random.key(0))
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)
    mean2, col_cov2, row_scale2, df2 = mniw.standard_from_natural(nat)
    np.testing.assert_allclose(mean, mean2, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(col_cov, col_cov2, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(row_scale, row_scale2, rtol=1e-8, atol=1e-9)
    assert float(df2) == float(df)


def test_posterior_mean_matches_standard():
    mean, col_cov, row_scale, df = _random_prior(jax.random.key(1))
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)
    np.testing.assert_allclose(
        mniw.posterior_mean(nat), mean, rtol=1e-8, atol=1e-9
    )


def test_suff_stat_outer_products():
    y = jnp.array([1.0, -2.0])
    phi = jnp.array([0.5, 1.5, -1.0])
    st = mniw.suff_stat(y, phi)
    np.testing.assert_allclose(st.T0, np.outer(phi, y))
    np.testing.assert_allclose(st.T1, np.outer(phi, phi))
    np.testing.assert_allclose(st.T2, np.outer(y, y))
    assert float(st.T3) == 1.0


def test_additivity_is_conjugate_update():
    """prior + sum of rank-1 stats == posterior from batch regression."""
    key = jax.random.key(2)
    mean, col_cov, row_scale, df = _random_prior(key, m=4, n=1, df=6.0)
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)

    k1, k2 = jax.random.split(key)
    phis = jax.random.normal(k1, (20, 4), dtype=jnp.float64)
    ys = jax.random.normal(k2, (20, 1), dtype=jnp.float64)
    stats = jax.vmap(mniw.suff_stat)(ys, phis)
    summed = jax.tree_util.tree_map(lambda s: jnp.sum(s, 0), stats)
    post = jax.tree_util.tree_map(lambda a, b: a + b, nat, summed)

    # closed-form Bayesian linear regression update
    V_inv = np.linalg.inv(np.asarray(col_cov))
    Lam_post = V_inv + np.asarray(phis).T @ np.asarray(phis)
    b_post = V_inv @ np.asarray(mean).T + np.asarray(phis).T @ np.asarray(ys)
    mean_post = np.linalg.solve(Lam_post, b_post).T

    m2, cc2, _, df2 = mniw.standard_from_natural(post)
    np.testing.assert_allclose(m2, mean_post, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(cc2, np.linalg.inv(Lam_post), rtol=1e-8, atol=1e-10)
    assert float(df2) == pytest.approx(float(df) + 20.0)


def test_factor_predictive_matches_reference_path():
    """Fused factor path == standard-parameter predictive path."""
    key = jax.random.key(3)
    mean, col_cov, row_scale, df = _random_prior(key, m=6, n=2, df=9.0)
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)
    phi = jax.random.normal(jax.random.key(4), (6,), dtype=jnp.float64)

    std = mniw.standard_from_natural(nat)
    ref = mniw.predictive(*std, phi)
    fused = mniw.factor_predictive(mniw.factorize(nat), phi)

    np.testing.assert_allclose(fused.mean, ref.mean, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        fused.col_scale, jnp.squeeze(ref.col_scale), rtol=1e-8
    )
    np.testing.assert_allclose(fused.row_scale, ref.row_scale, rtol=1e-8, atol=1e-12)
    assert float(fused.df) == pytest.approx(float(ref.df))


def test_factor_mean_at_matches_posterior_mean():
    mean, col_cov, row_scale, df = _random_prior(jax.random.key(5), m=4, n=3)
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)
    phi = jax.random.normal(jax.random.key(6), (4,), dtype=jnp.float64)
    direct = mniw.posterior_mean(nat) @ phi
    fused = mniw.factor_mean_at(mniw.factorize(nat), phi)
    np.testing.assert_allclose(fused, direct, rtol=1e-9, atol=1e-11)


def test_sample_predictive_moments():
    """Matrix-t predictive draws match analytic mean and covariance."""
    mean, col_cov, row_scale, df = _random_prior(jax.random.key(7), m=5, n=2, df=30.0)
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)
    phi = jnp.asarray([0.3, -0.4, 1.0, 0.2, -0.7], dtype=jnp.float64)
    pred = mniw.factor_predictive(mniw.factorize(nat), phi)

    n_draws = 60_000
    keys = jax.random.split(jax.random.key(8), n_draws)
    draws = jax.vmap(lambda k: mniw.sample_predictive(k, pred))(keys)

    np.testing.assert_allclose(
        draws.mean(axis=0), pred.mean, atol=4e-2
    )
    # multivariate-t covariance: df/(df-2) * col_scale * row_scale
    expect_cov = (
        float(pred.df) / (float(pred.df) - 2.0)
        * float(pred.col_scale)
        * np.asarray(pred.row_scale)
    )
    emp_cov = np.cov(np.asarray(draws).T)
    np.testing.assert_allclose(emp_cov, expect_cov, rtol=8e-2, atol=8e-3)


def test_log_base_measure_direct_formula():
    """Cholesky log-det implementation vs the naive det-based formula."""
    import scipy.special

    mean, col_cov, row_scale, df = _random_prior(jax.random.key(9), m=4, n=2, df=7.0)
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)

    T0, T1, T2, T3 = map(np.asarray, nat)
    n, m = T2.shape[0], T1.shape[0]
    Psi = T2 - T0.T @ np.linalg.solve(T1, T0)
    expected = (
        -0.5 * n * m * np.log(2 * np.pi)
        + 0.5 * n * np.log(np.linalg.det(T1))
        - 0.5 * T3 * n * np.log(2.0)
        - scipy.special.multigammaln(T3 / 2.0, n)
        + 0.5 * T3 * np.log(np.linalg.det(Psi))
    )
    np.testing.assert_allclose(
        float(mniw.log_base_measure(nat)), float(expected), rtol=1e-7
    )


def test_sample_parameters_moments():
    """(A, S) draws match inverse-Wishart / matrix-normal moments."""
    mean, col_cov, row_scale, df = _random_prior(
        jax.random.key(10), m=3, n=2, df=12.0
    )
    nat = mniw.natural_from_standard(mean, col_cov, row_scale, df)

    n_draws = 20_000
    keys = jax.random.split(jax.random.key(11), n_draws)
    As, Ss = jax.vmap(lambda k: mniw.sample_parameters(k, nat))(keys)

    # E[S] = Psi / (df - n - 1)
    expect_S = np.asarray(row_scale) / (float(df) - 2.0 - 1.0)
    np.testing.assert_allclose(Ss.mean(axis=0), expect_S, rtol=5e-2, atol=3e-3)
    np.testing.assert_allclose(As.mean(axis=0), mean, atol=2e-2)

    # column covariance of A given S: rows of A have covariance ~ E[S]*V
    A_centered = np.asarray(As - mean)
    # covariance over the column index for row 0
    emp = np.einsum("kij,kil->jl", A_centered, A_centered) / n_draws
    expect = np.trace(expect_S) * np.asarray(col_cov)
    # inverse-Wishart draws are heavy-tailed; allow MC slack on the
    # off-diagonal terms
    np.testing.assert_allclose(
        emp, expect, rtol=1e-1, atol=0.05 * np.abs(expect).max()
    )


def _accumulated_stats_bl(key, m, n, N=64, terms=None):
    k1, k2, k3 = jax.random.split(key, 3)
    stats = mniw.suff_stat_bl(
        jax.random.normal(k2, (n, N), jnp.float32),
        jax.random.normal(k1, (m, N), jnp.float32),
    )
    for i in range(terms or 3 * m):
        kk = jax.random.fold_in(k3, i)
        stats = jax.tree_util.tree_map(
            lambda a, b: a + b,
            stats,
            mniw.suff_stat_bl(
                jax.random.normal(jax.random.fold_in(kk, 1), (n, N), jnp.float32),
                jax.random.normal(kk, (m, N), jnp.float32),
            ),
        )
    return stats


def test_pack_unpack_roundtrip():
    stats = _accumulated_stats_bl(jax.random.key(0), m=5, n=2)
    S = mniw.pack_stats_bl(stats)
    assert S.shape[0] == mniw.packed_rows(5, 2)
    back = mniw.unpack_stats_bl(S, 5, 2)
    flat = mniw.to_flat_bl(stats)
    for a, b in zip(back, flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_factorize_project_packed_matches_flat():
    m, n = 5, 1
    stats = _accumulated_stats_bl(jax.random.key(1), m=m, n=n)
    prior = mniw.MNIW(
        jnp.zeros((m, n), jnp.float32),
        jnp.eye(m, dtype=jnp.float32) * 2.0,
        jnp.eye(n, dtype=jnp.float32) * 3.0,
        jnp.asarray(4.0, jnp.float32),
    )
    phi = jax.random.normal(jax.random.key(2), (m, stats.T3.shape[-1]), jnp.float32)
    fp_ref = mniw.factorize_project_bl(
        mniw.to_flat_bl(stats), phi, prior=prior, lam=0.99, use_pallas=False
    )
    fp_pk = mniw.factorize_project_packed_bl(
        mniw.pack_stats_bl(stats), phi, prior=prior, lam=0.99, m=m, n=n,
        use_pallas=False,
    )
    for a, b in zip(fp_pk, fp_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_draw_update_packed_matches_composed():
    """The fused draw+update (XLA fallback) == factorize_project +
    sample_projected + rank-1 update composed by hand, bitwise on the
    same key."""
    m, n = 5, 2
    stats = _accumulated_stats_bl(jax.random.key(3), m=m, n=n)
    prior = mniw.MNIW(
        jnp.zeros((m, n), jnp.float32),
        jnp.eye(m, dtype=jnp.float32) * 2.0,
        jnp.eye(n, dtype=jnp.float32) * 3.0,
        jnp.asarray(6.0, jnp.float32),
    )
    phi = jax.random.normal(jax.random.key(4), (m, stats.T3.shape[-1]), jnp.float32)
    key = jax.random.key(5)
    lam = 0.97

    S_new, y, ld1, ldp = mniw.draw_update_packed_bl(
        key, mniw.pack_stats_bl(stats), phi, prior=prior, lam=lam,
        m=m, n=n, use_pallas=False,
    )

    flat = mniw.to_flat_bl(stats)
    fp = mniw.factorize_project_bl(
        flat, phi, prior=prior, lam=lam, use_pallas=False
    )
    y_ref = mniw.sample_projected_bl(key, fp, jnp.float32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    suff = mniw.suff_stat_flat_bl(y_ref, phi)
    want = jax.tree_util.tree_map(lambda s, d: s * lam + d, flat, suff)
    np.testing.assert_allclose(
        np.asarray(S_new), np.asarray(mniw.pack_stats_bl(want)),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(fp.logdet_T1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ldp), np.asarray(fp.logdet_Psi), rtol=1e-6)
