"""cSMC invariance against an exact Kalman/RTS smoother.

The decisive correctness test for the particle-Gibbs kernels: on a
linear-Gaussian AR(1) model with fixed parameters, repeated conditional-SMC
sweeps form a Markov chain whose invariant distribution must be the exact
joint smoothing posterior. Pooled trajectories are compared against the
Rauch-Tung-Striebel moments.

This test is what caught the reference's ancestor-sampling bug (the
lookahead factor in the AS weights, ``/root/reference/src/PGAS.py:117``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bipk_tpu.algorithms.pgas import build_pgas_csmc


def _ar1_data(key, a, q, r, T):
    def step(x, k):
        kw, kv = jax.random.split(k)
        xn = a * x + q * jax.random.normal(kw, (1,), jnp.float64)
        y = xn + r * jax.random.normal(kv, (1,), jnp.float64)
        return xn, (xn, y)

    keys = jax.random.split(key, T - 1)
    x0 = jnp.zeros((1,), dtype=jnp.float64)
    _, (xs, ys) = jax.lax.scan(step, x0, keys)
    return (
        jnp.concatenate([x0[None], xs]),
        jnp.concatenate([jnp.zeros((1, 1), dtype=jnp.float64), ys]),
    )


def _rts(y, a, q2, r2, p0):
    """Kalman filter + RTS smoother; no observation at t=0 (matching the
    samplers, whose weighting starts at t=1)."""
    T = len(y)
    mf, pf = np.zeros(T), np.zeros(T)
    m, p = 0.0, p0
    mf[0], pf[0] = m, p
    for t in range(1, T):
        m, p = a * m, a * a * p + q2
        k = p / (p + r2)
        m, p = m + k * (y[t] - m), (1 - k) * p
        mf[t], pf[t] = m, p
    ms, ps = mf.copy(), pf.copy()
    for t in range(T - 2, -1, -1):
        pp = a * a * pf[t] + q2
        g = a * pf[t] / pp
        ms[t] = mf[t] + g * (ms[t + 1] - a * mf[t])
        ps[t] = pf[t] + g * g * (ps[t + 1] - pp)
    return ms, ps


@pytest.mark.parametrize("r_obs", [0.05, 0.4])
def test_csmc_invariance_vs_rts(r_obs):
    a, q, T = 0.85, 0.3, 50
    p0 = 1e-2
    key = jax.random.key(7)
    key, key_sim = jax.random.split(key)
    X, Y = _ar1_data(key_sim, a, q, r_obs, T)
    y = np.asarray(Y)[:, 0]
    ms, ps = _rts(y, a, q * q, r_obs * r_obs, p0)

    sweep = jax.jit(
        build_pgas_csmc(
            basis_fn=lambda x, u: x,
            likelihood_fn=lambda obs, x, u: jnp.squeeze(
                -0.5 * ((obs[0] - x[0]) / r_obs) ** 2
            ),
            n_particles=64,
            dtype=jnp.float64,
        )
    )
    A = jnp.array([[a]])
    S = jnp.array([[q * q]])
    inputs = jnp.zeros((T, 0))

    ref = jnp.asarray(X)
    burn, keep = 60, 240
    trajs = []
    for k in range(burn + keep):
        key, key_k = jax.random.split(key)
        ref = sweep(key_k, Y, inputs, np.zeros(1), np.eye(1) * p0, ref, A, S)
        if k >= burn:
            trajs.append(np.asarray(ref))
    trajs = np.stack(trajs)[:, :, 0]  # (keep, T)

    emp_mean = trajs.mean(0)
    emp_var = trajs.var(0)
    post_std = np.sqrt(ps)

    # pooled mean within a fraction of the posterior std (the chain has
    # autocorrelation, so the tolerance is looser than iid MC error)
    assert np.abs(emp_mean - ms).mean() < 0.35 * post_std.mean(), (
        np.abs(emp_mean - ms).mean(),
        post_std.mean(),
    )
    # variances at the right scale (no systematic over/under-dispersion)
    ratio = emp_var[5:] / ps[5:]
    assert 0.6 < ratio.mean() < 1.4, ratio.mean()
