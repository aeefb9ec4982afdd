"""Pallas TPU kernels for the per-particle MNIW hot path.

The filter step's dominant cost is small-matrix algebra batched over the
particle population: Cholesky of ``prior + stats`` (m x m, m = 9..41),
triangular solves against it, and quadratic forms. XLA executes the
unrolled elementwise formulation (``ops.batched_linalg``) as hundreds of
separate kernels with fixed launch overhead each — measured ~22 ms/step at
N = 32768 on v5e for the factorization alone. Each kernel below performs
the whole fused computation for a lane-aligned block of particles resident
in VMEM, so the entire factorization is one Mosaic kernel.

Layout: batch-last (``(m, m, N)`` etc., particles in lanes) matching
``ops.batched_linalg``. Used automatically on TPU backends; set
``BIPK_DISABLE_PALLAS=1`` to force the pure-XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 512  # particles per kernel instance (lanes: 4 f32 tiles)


def enabled() -> bool:
    if os.environ.get("BIPK_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


def _pad_block(n: int) -> int:
    return -(-n // _BLOCK) * _BLOCK


def _chol_cols(read_a, m, jitter):
    """Shared unrolled Cholesky on ``(N_b,)`` vector lanes.

    ``read_a(i, j)`` returns the (symmetrized) matrix entry as a vector.
    Returns the list of column vectors ``cols[j] (m, N_b)``.
    """
    if jitter:
        trace = read_a(0, 0)
        for i in range(1, m):
            trace = trace + read_a(i, i)
        bump = (jitter / m) * trace
    else:
        bump = None

    cols = []
    for j in range(m):
        # s_i = A[i, j] - sum_{k<j} L[i,k] L[j,k]
        s = [read_a(i, j) for i in range(m)]
        if bump is not None:
            s[j] = s[j] + bump
        for k in range(j):
            ljk = cols[k][j]
            for i in range(j, m):
                s[i] = s[i] - cols[k][i] * ljk
        inv = jax.lax.rsqrt(s[j])
        zero = jnp.zeros_like(s[j])
        col = [zero] * j + [s[i] * inv for i in range(j, m)]
        cols.append(col)
    return cols


def _factorize_kernel(t0_ref, t1_ref, t2_ref, chol_ref, white_ref, row_ref, *, m, n, jitter):
    def read_a(i, j):
        return 0.5 * (t1_ref[i, j, :] + t1_ref[j, i, :])

    cols = _chol_cols(read_a, m, jitter)

    for j in range(m):
        for i in range(m):
            chol_ref[i, j, :] = cols[j][i]

    # forward substitution: white = L^{-1} T0, column by column of T0
    white = []
    for i in range(m):
        row = []
        for c in range(n):
            acc = t0_ref[i, c, :]
            for k in range(i):
                acc = acc - cols[k][i] * white[k][c]
            row.append(acc / cols[i][i])
        white.append(row)
        for c in range(n):
            white_ref[i, c, :] = row[c]

    # row_scale = T2 - white^T white
    for a in range(n):
        for b in range(n):
            acc = t2_ref[a, b, :]
            for k in range(m):
                acc = acc - white[k][a] * white[k][b]
            row_ref[a, b, :] = acc


def _project_kernel(chol_ref, white_ref, phi_ref, mean_ref, col_ref, *, m, n):
    """v = L^{-1} phi; mean = white^T v; col_scale = v.v + 1."""
    v = []
    for i in range(m):
        acc = phi_ref[i, :]
        for k in range(i):
            acc = acc - chol_ref[i, k, :] * v[k]
        v.append(acc / chol_ref[i, i, :])
    for c in range(n):
        acc = white_ref[0, c, :] * v[0]
        for k in range(1, m):
            acc = acc + white_ref[k, c, :] * v[k]
        mean_ref[c, :] = acc
    acc = v[0] * v[0]
    for k in range(1, m):
        acc = acc + v[k] * v[k]
    col_ref[0, :] = acc + 1.0


def _log_base_measure_kernel(
    t0_ref, t1_ref, t2_ref, out_ref, *, m, n, jitter
):
    """Log-determinant pieces of the MNIW base measure (no nu terms).

    Writes ``out[0] = logdet(sym(T1))`` and ``out[1] = logdet(Psi)`` with
    ``Psi = T2 - T0^T sym(T1)^{-1} T0``. Restricted to ``n <= 2`` (every
    workload has 1-2 output dims); callers fall back to the XLA path above.
    """
    assert n <= 2, "pallas log_base_measure supports n <= 2"

    def read_a(i, j):
        return 0.5 * (t1_ref[i, j, :] + t1_ref[j, i, :])

    cols = _chol_cols(read_a, m, jitter)
    half_logdet_t1 = jnp.log(cols[0][0])
    for i in range(1, m):
        half_logdet_t1 = half_logdet_t1 + jnp.log(cols[i][i])

    white = []
    for i in range(m):
        row = []
        for c in range(n):
            acc = t0_ref[i, c, :]
            for k in range(i):
                acc = acc - cols[k][i] * white[k][c]
            row.append(acc / cols[i][i])
        white.append(row)

    psi = [[None] * n for _ in range(n)]
    for a in range(n):
        for b in range(n):
            acc = t2_ref[a, b, :]
            for k in range(m):
                acc = acc - white[k][a] * white[k][b]
            psi[a][b] = acc
    if n == 1:
        logdet_psi = jnp.log(psi[0][0])
    else:
        off = 0.5 * (psi[0][1] + psi[1][0])
        logdet_psi = jnp.log(psi[0][0] * psi[1][1] - off * off)

    out_ref[0, :] = 2.0 * half_logdet_t1
    out_ref[1, :] = logdet_psi


def _pad_last(x, total):
    pad = total - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, constant_values=1.0)


@functools.partial(jax.jit, static_argnames=("jitter",))
def factorize_blocks(T0, T1, T2, jitter: float):
    """Fused ``chol(sym(T1)+jitter) / white / row_scale`` over particles.

    ``T0 (m, n, N)``, ``T1 (m, m, N)``, ``T2 (n, n, N)`` ->
    ``(chol (m, m, N), white (m, n, N), row_scale (n, n, N))``.
    """
    m, n, N = T0.shape[0], T0.shape[1], T0.shape[-1]
    total = _pad_block(N)
    t0 = _pad_last(T0, total)
    t1 = _pad_last(T1, total)
    t2 = _pad_last(T2, total)
    grid = (total // _BLOCK,)

    def spec(r, c):
        return pl.BlockSpec(
            (r, c, _BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    chol, white, row = pl.pallas_call(
        functools.partial(_factorize_kernel, m=m, n=n, jitter=jitter),
        grid=grid,
        in_specs=[spec(m, n), spec(m, m), spec(n, n)],
        out_specs=[spec(m, m), spec(m, n), spec(n, n)],
        out_shape=[
            jax.ShapeDtypeStruct((m, m, total), T1.dtype),
            jax.ShapeDtypeStruct((m, n, total), T0.dtype),
            jax.ShapeDtypeStruct((n, n, total), T2.dtype),
        ],
    )(t0, t1, t2)
    return chol[..., :N], white[..., :N], row[..., :N]


@jax.jit
def project_blocks(chol, white, phi):
    """Fused ``v = chol^{-1} phi``; ``mean = white^T v``;
    ``col_scale = v.v + 1`` -> ``(mean (n, N), col_scale (N,))``."""
    m, n, N = white.shape[0], white.shape[1], white.shape[-1]
    total = _pad_block(N)
    grid = (total // _BLOCK,)

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            (*dims, _BLOCK),
            (lambda i: (0, 0, i)) if nd == 2 else (lambda i: (0, i)),
            memory_space=pltpu.VMEM,
        )

    mean, col = pl.pallas_call(
        functools.partial(_project_kernel, m=m, n=n),
        grid=grid,
        in_specs=[spec(m, m), spec(m, n), spec(m)],
        out_specs=[spec(n), spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((n, total), phi.dtype),
            jax.ShapeDtypeStruct((1, total), phi.dtype),
        ],
    )(_pad_last(chol, total), _pad_last(white, total), _pad_last(phi, total))
    return mean[..., :N], col[0, :N]


@functools.partial(jax.jit, static_argnames=("jitter",))
def log_base_measure_logdets(T0, T1, T2, jitter: float):
    """Fused log-determinant pieces: returns ``(logdet_T1, logdet_Psi)``
    each ``(N,)`` where ``Psi = T2 - T0^T sym(T1)^{-1} T0``."""
    m, n, N = T0.shape[0], T0.shape[1], T0.shape[-1]
    total = _pad_block(N)
    grid = (total // _BLOCK,)

    def spec(r, c):
        return pl.BlockSpec(
            (r, c, _BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        functools.partial(_log_base_measure_kernel, m=m, n=n, jitter=jitter),
        grid=grid,
        in_specs=[spec(m, n), spec(m, m), spec(n, n)],
        out_specs=pl.BlockSpec(
            (2, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, total), T1.dtype),
    )(_pad_last(T0, total), _pad_last(T1, total), _pad_last(T2, total))
    return out[0, :N], out[1, :N]
