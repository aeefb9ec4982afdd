"""Small-matrix linear algebra that vectorizes over large particle batches.

XLA's stock ``cholesky``/``triangular_solve`` on TPU lower batched *small*
matrices (m = 9..41 here, batch = thousands..millions of particles) into
serial loops of un-fused kernels — measured ~5 ms for a (2048, 20, 20) f32
Cholesky on v5e, ~200x slower than the arithmetic requires. The routines
below unroll the factorization over the (static, tiny) matrix dimension
into pure elementwise multiply-subtract chains with **no dots and no
dynamic-update-slices**, so XLA fuses the whole factorization into a single
VPU kernel; under ``vmap`` every value is an (N,)-wide vector.

All functions take a single matrix and are designed to be ``vmap``-ed; they
fall back to the stock lowering above ``_UNROLL_LIMIT``, where MXU-backed
batched dots win.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_UNROLL_LIMIT = 96


def chol_lower(A: jax.Array) -> jax.Array:
    """Lower Cholesky of one SPD ``(m, m)`` matrix.

    Column-wise elimination with rank-1 elementwise updates: column ``j``
    is ``(A[:, j] - sum_{k<j} L_k L_k[j]) * rsqrt(diag)``. O(m^2/2)
    elementwise vector ops, all fusable.
    """
    m = A.shape[-1]
    if m > _UNROLL_LIMIT:
        return jnp.linalg.cholesky(A)
    rows = jnp.arange(m)
    cols = []
    for j in range(m):
        s = A[:, j]
        for k in range(j):
            s = s - cols[k] * cols[k][j]
        col = s * jax.lax.rsqrt(s[j])
        cols.append(jnp.where(rows >= j, col, jnp.zeros_like(col)))
    return jnp.stack(cols, axis=-1)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L x = b`` (lower-triangular) by unrolled forward
    substitution. ``b`` may be ``(m,)`` or ``(m, r)``."""
    m = L.shape[-1]
    if m > _UNROLL_LIMIT:
        two_d = b.ndim == 2
        bb = b if two_d else b[..., None]
        out = jax.lax.linalg.triangular_solve(
            L, bb, left_side=True, lower=True
        )
        return out if two_d else out[..., 0]
    xs = []
    for i in range(m):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i, k] * xs[k]
        xs.append(acc / L[i, i])
    return jnp.stack(xs)


def solve_lower_t(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L^T x = b`` (upper-triangular) by unrolled back
    substitution."""
    m = L.shape[-1]
    if m > _UNROLL_LIMIT:
        two_d = b.ndim == 2
        bb = b if two_d else b[..., None]
        out = jax.lax.linalg.triangular_solve(
            L, bb, left_side=True, lower=True, transpose_a=True
        )
        return out if two_d else out[..., 0]
    xs = [None] * m
    for i in range(m - 1, -1, -1):
        acc = b[i]
        for k in range(i + 1, m):
            acc = acc - L[k, i] * xs[k]
        xs[i] = acc / L[i, i]
    return jnp.stack(xs)


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L L^T x = b`` from the lower factor."""
    return solve_lower_t(L, solve_lower(L, b))


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """``log det(A) = 2 sum(log(diag(chol(A))))``."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


# ---------------------------------------------------------------------------
# Batch-last ("structure of arrays") variants.
#
# TPU f32 tiles are (8 sublanes, 128 lanes) over the last two axes, so a
# (N, m, m) stack of small matrices pads m -> 128 in lanes (~6x memory bloat
# at m=20, 84% idle lanes). Layout (m, m, N) puts the particle batch in
# lanes: compact, fully utilized, and every unrolled op below is an (m, N)
# or (N,) elementwise op that XLA fuses into a single VPU kernel.
# ---------------------------------------------------------------------------


def chol_lower_bl(A: jax.Array) -> jax.Array:
    """Lower Cholesky, batch-last: ``A (m, m, N) -> L (m, m, N)``."""
    m = A.shape[0]
    rows = jnp.arange(m)[:, None]
    cols = []
    for j in range(m):
        s = A[:, j]  # (m, N)
        for k in range(j):
            s = s - cols[k] * cols[k][j]
        col = s * jax.lax.rsqrt(s[j])
        cols.append(jnp.where(rows >= j, col, jnp.zeros_like(col)))
    return jnp.stack(cols, axis=1)


def solve_lower_bl(L: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution, batch-last.

    ``L (m, m, N)`` (or constant ``(m, m)``), ``b (m, N)`` or ``(m, r, N)``.
    """
    m = L.shape[0]
    xs = []
    for i in range(m):
        acc = b[i]
        for k in range(i):
            acc = acc - L[i, k] * xs[k]
        xs.append(acc / L[i, i])
    return jnp.stack(xs)


def solve_lower_t_bl(L: jax.Array, b: jax.Array) -> jax.Array:
    """Back substitution ``L^T x = b``, batch-last."""
    m = L.shape[0]
    xs = [None] * m
    for i in range(m - 1, -1, -1):
        acc = b[i]
        for k in range(i + 1, m):
            acc = acc - L[k, i] * xs[k]
        xs[i] = acc / L[i, i]
    return jnp.stack(xs)


def logdet_from_chol_bl(L: jax.Array) -> jax.Array:
    """``(m, m, N) -> (N,)`` log-determinants."""
    m = L.shape[0]
    out = jnp.log(L[0, 0])
    for i in range(1, m):
        out = out + jnp.log(L[i, i])
    return 2.0 * out
