"""Rank-1 Cholesky maintenance (ops.cholup) and the factor-carry cSMC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.algorithms import build_apf
from bipk_tpu.algorithms.csmc import build_csmc
from bipk_tpu.algorithms.gibbs import summed_reference_stats
from bipk_tpu.models import vehicle as veh
from bipk_tpu.ops import batched_linalg as bla
from bipk_tpu.ops import cholup, mniw
from bipk_tpu.utils.matio import sample_reference_trajectory

# multi-minute on the 1-vCPU CI host (mesh compiles, GSPMD,
# subprocess fixtures); excluded from the core tier
pytestmark = pytest.mark.slow


def _spd_stack(key, p, N, dtype=jnp.float64):
    X = jax.random.normal(key, (p, 3 * p, N), dtype)
    return jnp.einsum("ikn,jkn->ijn", X, X)


def test_rank1_update_matches_refactorization():
    key = jax.random.key(0)
    p, N = 9, 37
    A = _spd_stack(key, p, N)
    L = bla.chol_lower_bl(A)
    x = jax.random.normal(jax.random.fold_in(key, 1), (p, N), jnp.float64)
    up = cholup.chol_rank1_update_bl(L, x)
    ref = bla.chol_lower_bl(A + x[:, None, :] * x[None, :, :])
    np.testing.assert_allclose(np.asarray(up), np.asarray(ref), atol=1e-12)


def test_rank1_downdate_inverts_update():
    key = jax.random.key(1)
    p, N = 7, 23
    L = bla.chol_lower_bl(_spd_stack(key, p, N))
    x = jax.random.normal(jax.random.fold_in(key, 1), (p, N), jnp.float64)
    back = cholup.chol_rank1_downdate_bl(
        cholup.chol_rank1_update_bl(L, x), x
    )
    np.testing.assert_allclose(np.asarray(back), np.asarray(L), atol=1e-10)


def test_rank1_update_broadcast_vector():
    """A shared (p, 1) update vector broadcasts across the batch."""
    key = jax.random.key(2)
    p, N = 5, 16
    L = bla.chol_lower_bl(_spd_stack(key, p, N))
    x = jax.random.normal(jax.random.fold_in(key, 1), (p,), jnp.float64)
    a = cholup.chol_rank1_update_bl(L, x[:, None])
    b = cholup.chol_rank1_update_bl(L, jnp.tile(x[:, None], (1, N)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def _random_mniw_bl(key, m, n, N):
    k0, k1, k2, k3 = jax.random.split(key, 4)
    T0 = jax.random.normal(k0, (m, n, N), jnp.float64)
    T1 = _spd_stack(k1, m, N)
    T2 = _spd_stack(k2, n, N) + 3.0 * jnp.eye(n, dtype=jnp.float64)[:, :, None]
    T3 = jnp.abs(jax.random.normal(k3, (N,))) + n + 4.0
    return mniw.MNIW(T0, T1, T2, T3)


def test_aug_factor_views_match_factorize():
    nat = _random_mniw_bl(jax.random.key(3), 6, 2, 19)
    F, df = cholup.aug_factorize_bl(nat)
    fac = cholup.aug_to_factor(F, df, 6)
    ref = mniw.factorize_bl(nat, use_pallas=False)
    np.testing.assert_allclose(np.asarray(fac.chol), np.asarray(ref.chol), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(fac.white_T0), np.asarray(ref.white_T0), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(fac.row_scale), np.asarray(ref.row_scale), atol=1e-10
    )


def test_aug_log_base_measure_matches_direct():
    nat = _random_mniw_bl(jax.random.key(4), 6, 2, 19)
    F, df = cholup.aug_factorize_bl(nat)
    got = cholup.aug_log_base_measure(F, df, 6)
    want = mniw.log_base_measure_bl(nat, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


def test_log_base_measure_from_factor_matches_direct():
    nat = _random_mniw_bl(jax.random.key(5), 6, 2, 19)
    fac = mniw.factorize_bl(nat, use_pallas=False)
    got = mniw.log_base_measure_from_factor_bl(fac)
    want = mniw.log_base_measure_bl(nat, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


def test_csmc_rank1_matches_direct_f64():
    """The O(p^2) factor-carry cSMC reproduces the refactorize-per-step
    sweep exactly (f64): same trajectory draw, log-weights to 1e-10."""
    cfg = veh.VehicleConfig(t_end=0.5)  # 25 steps, two m=20 GPs
    model = veh.make_model(cfg)
    key = jax.random.key(0)
    key, ks = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(ks, cfg, dtype=jnp.float64)
    N = 40
    apf = jax.jit(
        build_apf(model.ssm, model.gps, N, 0.999, dtype=jnp.float64)
    )
    res = apf(key, Y, inputs, model.x0, model.p0)
    key, kt = jax.random.split(key)
    ref_state, ref_iv = sample_reference_trajectory(kt, res)
    ref_stats = summed_reference_stats(
        model.gps,
        jnp.atleast_2d(jnp.asarray(ref_state).T).T,
        ref_iv,
        inputs,
        jnp.float64,
    )
    outs = {}
    for r1 in (True, False):
        csmc = jax.jit(
            build_csmc(model.ssm, model.gps, N, dtype=jnp.float64, rank1=r1)
        )
        outs[r1] = csmc(
            key, Y, inputs, model.x0, model.p0, ref_state, ref_iv, ref_stats
        )
    np.testing.assert_allclose(
        np.asarray(outs[True].state_traj),
        np.asarray(outs[False].state_traj),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(outs[True].log_weights),
        np.asarray(outs[False].log_weights),
        atol=1e-9,
    )
