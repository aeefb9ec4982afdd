"""Rank-1 Cholesky maintenance for the marginalized-PGAS hot path.

The conditional-SMC kernel (Algorithm 3) runs with forgetting factor 1.0
(``/root/reference/src/Algorithm3.py:29-41``), so each particle's MNIW
``prior + stats`` evolves purely by rank-1 data updates (``+ [phi; y]
[phi; y]^T``) and the reference-future bookkeeping purely by rank-1
decrements (``- [phi_ref; y_ref][phi_ref; y_ref]^T``,
``Algorithm3.py:162-174``). Maintaining the Cholesky factor directly —
O(p^2) per step instead of the O(p^3) refactorization the reference
performs from scratch each step — removes all three per-step
factorization-class kernels from the sweep.

The factor is the **augmented** lower Cholesky of

    M = [[T1, T0], [T0^T, T2]]   (p = m + n)

whose blocks are ``[[L, 0], [W^T, C]]`` with ``L = chol(T1)``,
``W = L^{-1} T0`` (the whitened cross statistics) and ``C = chol(Psi)``,
``Psi = T2 - W^T W`` — exactly the pieces :class:`bipk_tpu.ops.mniw.
MNIWFactor` carries, so a view of the augmented factor feeds the existing
posterior-mean / predictive kernels unchanged. A rank-1 update of M is a
standard Cholesky update of the augmented factor; the log-determinants the
ancestor-sampling weights need come straight off its diagonal.

All routines are batch-last (``(p, p, N)``, particles in lanes) and
unrolled over the static small dimension p, matching
``bipk_tpu.ops.batched_linalg``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bipk_tpu.ops import batched_linalg as bla
from bipk_tpu.ops import mniw


def chol_rank1_update_bl(L: jax.Array, x: jax.Array) -> jax.Array:
    """``L' L'^T = L L^T + x x^T``, batch-last.

    ``L (p, p, N)`` lower-triangular, ``x (p, N)`` (or broadcastable
    ``(p,)`` / ``(p, 1)``). O(p^2/2) fusable elementwise ops.
    """
    p = L.shape[0]
    xs = [x[i] for i in range(p)]
    cols = []
    for j in range(p):
        ljj = L[j, j]
        xj = xs[j]
        r = jnp.sqrt(ljj * ljj + xj * xj)
        c = r / ljj
        s = xj / ljj
        col = [jnp.zeros_like(r)] * j + [r]
        for i in range(j + 1, p):
            lij = (L[i, j] + s * xs[i]) / c
            xs[i] = c * xs[i] - s * lij
            col.append(lij)
        cols.append(jnp.stack(jnp.broadcast_arrays(*col)))
    return jnp.stack(cols, axis=1)


def chol_rank1_downdate_bl(L: jax.Array, x: jax.Array) -> jax.Array:
    """``L' L'^T = L L^T - x x^T``, batch-last (hyperbolic rotations).

    The caller guarantees ``L L^T - x x^T`` stays SPD (true by construction
    for the reference-future decrement: the remaining future statistics are
    a sum of rank-1 terms, so ``prior + stats + R_{t+1}`` is SPD).
    """
    p = L.shape[0]
    xs = [x[i] for i in range(p)]
    cols = []
    for j in range(p):
        ljj = L[j, j]
        xj = xs[j]
        r = jnp.sqrt(ljj * ljj - xj * xj)
        c = r / ljj
        s = xj / ljj
        col = [jnp.zeros_like(r)] * j + [r]
        for i in range(j + 1, p):
            lij = (L[i, j] - s * xs[i]) / c
            xs[i] = c * xs[i] - s * lij
            col.append(lij)
        cols.append(jnp.stack(jnp.broadcast_arrays(*col)))
    return jnp.stack(cols, axis=1)


def aug_factorize_bl(nat: mniw.MNIW, jitter: float | None = None):
    """Augmented lower Cholesky of a batch-last MNIW: ``(F (p, p, N), df)``.

    Applies the same dtype-relative jitter to the T1 block as
    :func:`bipk_tpu.ops.mniw.factorize_bl` (done once here; the subsequent
    rank-1 maintenance needs none).
    """
    if jitter is None:
        jitter = mniw._default_jitter(nat.T1.dtype)
    m = nat.T1.shape[0]
    n = nat.T2.shape[0]
    T1s = 0.5 * (nat.T1 + jnp.swapaxes(nat.T1, 0, 1))
    if jitter:
        trace = sum(T1s[i, i] for i in range(m)) / m
        T1s = T1s + (jitter * trace) * jnp.eye(m, dtype=T1s.dtype)[:, :, None]
    T2s = 0.5 * (nat.T2 + jnp.swapaxes(nat.T2, 0, 1))
    top = jnp.concatenate([T1s, nat.T0], axis=1)  # (m, p, N)
    bot = jnp.concatenate(
        [jnp.swapaxes(nat.T0, 0, 1), T2s], axis=1
    )  # (n, p, N)
    M = jnp.concatenate([top, bot], axis=0)  # (p, p, N)
    return bla.chol_lower_bl(M), nat.T3


def aug_to_factor(F: jax.Array, df: jax.Array, m: int) -> mniw.MNIWFactor:
    """View an augmented factor as an :class:`mniw.MNIWFactor`.

    ``chol = F[:m, :m]``, ``white_T0 = F[m:, :m]^T`` and
    ``row_scale = C C^T`` with ``C = F[m:, m:]`` (n <= 2 everywhere, so the
    small Gram product is unrolled).
    """
    n = F.shape[0] - m
    chol = F[:m, :m]
    white = jnp.swapaxes(F[m:, :m], 0, 1)  # (m, n, N)
    C = F[m:, m:]
    row_scale = jnp.stack(
        [
            jnp.stack(
                [
                    sum(C[a, k] * C[b, k] for k in range(min(a, b) + 1))
                    for b in range(n)
                ]
            )
            for a in range(n)
        ]
    )
    return mniw.MNIWFactor(chol, white, row_scale, df)


def aug_log_base_measure(F: jax.Array, df: jax.Array, m: int) -> jax.Array:
    """MNIW log base measure straight off an augmented factor's diagonal.

    Mathematically identical to ``mniw.log_base_measure_bl`` of the
    corresponding natural parameters: ``logdet T1 = 2 sum log diag(L)``,
    ``logdet Psi = 2 sum log diag(C)``.
    """
    import jax.scipy as jsp

    p = F.shape[0]
    n = p - m
    half_ld_t1 = jnp.log(F[0, 0])
    for i in range(1, m):
        half_ld_t1 = half_ld_t1 + jnp.log(F[i, i])
    half_ld_psi = jnp.log(F[m, m])
    for i in range(m + 1, p):
        half_ld_psi = half_ld_psi + jnp.log(F[i, i])
    nu = df
    out = -0.5 * n * m * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=nu.dtype))
    out = out + n * half_ld_t1
    out = out - 0.5 * nu * n * jnp.log(jnp.asarray(2.0, dtype=nu.dtype))
    out = out - jsp.special.multigammaln(nu / 2.0, n)
    out = out + nu * half_ld_psi
    return out
