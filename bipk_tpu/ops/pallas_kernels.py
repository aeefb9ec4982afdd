"""Pallas TPU kernels for the per-particle MNIW hot path.

The filter step's dominant cost is small-matrix algebra batched over the
particle population: Cholesky of ``prior + lam * stats`` (m x m, m = 9..41),
triangular solves against it, and quadratic forms. XLA executes the
unrolled elementwise formulation (``ops.batched_linalg``) as hundreds of
separate kernels with fixed launch overhead each — measured ~22 ms/step at
N = 32768 on v5e for the factorization alone. Each kernel below performs
the whole fused computation for a lane-aligned block of particles resident
in VMEM, so the entire factorization is one Mosaic kernel.

Layout: batch-last (``(m, m, N)`` etc., particles in lanes) matching
``ops.batched_linalg``. Inside a kernel the particle block is shaped
``(8, 128)`` — a full f32 sublane x lane tile — so every unrolled
multiply-subtract runs the VPU at full width. (A 1-D ``(512,)`` block
occupies one sublane of four lane-tiles: 8x less arithmetic throughput —
measured 3.1 ms/step vs 0.6 ms/step for the factorization at N = 32768,
m = 20 on v5e.) Matrices with m above the VMEM budget for that layout
(``supported(m)`` is False) use the unrolled-XLA path instead.

Used automatically on TPU backends; set ``BIPK_DISABLE_PALLAS=1`` to force
the pure-XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# f32 sublane count: values are full (8, 128) tiles by default. Wider
# values (16/32 sublanes) decompose into INDEPENDENT per-(8, 128) hardware
# ops, so the serial Cholesky dependency chain of one sub-tile overlaps
# the VPU pipeline latency of another — the draw/update kernel is
# compute-bound on exactly that chain (352 us vs a 74 us HBM bound at
# m = 20, docs/DESIGN.md round-3 roofline).
_ROWS = int(os.environ.get("BIPK_ROWS", "8"))
_BLOCK = _ROWS * _LANES  # particles per kernel instance
_BLOCK_1D = 512  # particles per instance in the 1-D fallback layout
# (m, m, 8, 128) in + out blocks + live temporaries must fit ~16 MB VMEM
# with double buffering; m = 24 peaks around 12 MB.
_MAX_M = 24
# Kernels WITHOUT m^2-sized outputs (fused project, log-base-measure) can
# go further using 1-D (512,) particle blocks: one sublane of eight (8x
# less VPU width) but still one fused kernel instead of hundreds of XLA
# launches — ~10x faster than the unrolled-XLA path for the m = 40/41
# workloads (toy, single-mass oscillator) on TPU.
_MAX_M_1D = 48


def supported(m: int) -> bool:
    """Whether the fused kernels with m^2-sized outputs handle this m."""
    return m <= _MAX_M


def supported_small_out(m: int) -> bool:
    """Whether the small-output fused kernels handle this m."""
    return m <= _MAX_M_1D


def supported_gather(m: int) -> bool:
    """Whether the fused gather+draw/update kernel handles this m (the cs
    layout carries no m^2-sized register working set, so it reaches the
    same m <= 48 budget as the small-output kernels)."""
    return m <= (_MAX_M_CS if _cs_layout(m) else _MAX_M)


def supported_factor(m: int) -> bool:
    """Whether the factor-emitting auxiliary kernel + factor-reusing draw
    kernel pair handles this m (tiled layout only)."""
    return m <= _MAX_M and not _cs_layout(m)


# BIPK_PALLAS_INTERPRET=1 runs every kernel through the Pallas
# interpreter (works on any backend): ~100x slower, but lets the
# TPU-parity suite validate the kernel math on a CPU-only CI host.
_INTERPRET = bool(os.environ.get("BIPK_PALLAS_INTERPRET"))


def _pallas_call(*args, **kwargs):
    return pl.pallas_call(*args, interpret=_INTERPRET, **kwargs)


def enabled() -> bool:
    if os.environ.get("BIPK_DISABLE_PALLAS"):
        return False
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


def _pad_last(x, total):
    pad = total - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, constant_values=1.0)


def _blockify(x, total, tiled=True):
    """Pad the trailing particle axis and, for the tiled layout, split it
    into (rows, lanes) so kernel values are full (8, 128) tiles.

    Inputs that already carry the blocked ``(..., nb, 128)`` particle
    layout pass through untouched — on TPU the 2-D<->blocked reshape is a
    PHYSICAL relayout (different (8, 128) tiling), ~40 us per 30 MB
    statistics matrix per step in the vehicle sweep; carrying the scan
    state pre-blocked eliminates it (see ``blocked`` in
    ``parallel/sharded.py``)."""
    if tiled and x.ndim == 3 and x.shape[-1] == _LANES:
        assert x.shape[-2] * _LANES == total, (x.shape, total)
        return x
    x = _pad_last(x, total)
    if tiled:
        return x.reshape(x.shape[:-1] + (total // _LANES, _LANES))
    return x


def is_blocked(x) -> bool:
    """Whether a packed-statistics array carries the pre-blocked
    ``(rows, nb, 128)`` particle layout."""
    return x.ndim == 3 and x.shape[-1] == _LANES


def blocked_particles(x) -> int:
    """Particle count of a possibly pre-blocked batch-last array."""
    return x.shape[-2] * _LANES if is_blocked(x) else x.shape[-1]


def _spec(lead, tiled=True):
    """BlockSpec for an array with leading dims ``lead`` + particle axis."""
    zeros = (0,) * len(lead)
    if tiled:
        return pl.BlockSpec(
            (*lead, _ROWS, _LANES),
            lambda i, _z=zeros: (*_z, i, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (*lead, _BLOCK_1D),
        lambda i, _z=zeros: (*_z, i),
        memory_space=pltpu.VMEM,
    )


def _unblock(x, n, tiled=True):
    if tiled:
        x = x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
    return x[..., :n]


def _chol_cols(read_a, m):
    """Shared unrolled Cholesky; ``read_a(i, j)`` returns the matrix entry
    as a particle-block value. Returns column vectors ``cols[j][i]``."""
    cols = []
    for j in range(m):
        # s_i = A[i, j] - sum_{k<j} L[i,k] L[j,k]
        s = [read_a(i, j) for i in range(m)]
        for k in range(j):
            ljk = cols[k][j]
            for i in range(j, m):
                s[i] = s[i] - cols[k][i] * ljk
        inv = jax.lax.rsqrt(s[j])
        zero = jnp.zeros_like(s[j])
        col = [zero] * j + [s[i] * inv for i in range(j, m)]
        cols.append(col)
    return cols


# Panel width of the scratch-backed blocked Cholesky. The fully-unrolled
# SSA form (`_chol_cols`) keeps all m(m+1)/2 factor entries live as
# (8, 128) vector values — ~210 vregs at m = 20, far past the register
# file, so Mosaic spills and every downstream use pays a VMEM reload
# (~m/2 reloads per entry). The blocked form keeps only one PANEL of
# columns live (<= panel * m values) and streams previous panels out of
# an explicit VMEM scratch ONCE per panel — VMEM traffic drops from
# O(m^3/6) to O(m^3/(2*panel)) loads. Arithmetic order is identical to
# `_chol_cols` (same k-ascending accumulation), so results are bitwise
# the same.
_CHOL_PANEL = int(os.environ.get("BIPK_CHOL_PANEL", "4"))


def _chol_scratch(read_a, m, l_ref, panel=None):
    """Panel-blocked unrolled Cholesky into a packed lower-triangular VMEM
    scratch: ``l_ref[i*(i+1)//2 + j] = L[i][j]``. Returns the SSA diagonal
    entries ``[L[0][0], ..., L[m-1][m-1]]`` (so the log-determinant and
    the solves' divisions don't re-read the scratch)."""
    if panel is None:
        panel = _CHOL_PANEL
    diag = []
    for jb in range(0, m, panel):
        hi = min(jb + panel, m)
        # load the panel's lower trapezoid of A
        s = {}
        for c in range(jb, hi):
            for i in range(c, m):
                s[(i, c)] = read_a(i, c)
        # update with previous panels: each L[i][k] is read from scratch
        # ONCE and reused across the panel's columns
        for k in range(jb):
            lck = {c: l_ref[c * (c + 1) // 2 + k] for c in range(jb, hi)}
            for i in range(jb, m):
                lik = lck[i] if i < hi else l_ref[i * (i + 1) // 2 + k]
                for c in range(jb, min(i + 1, hi)):
                    s[(i, c)] = s[(i, c)] - lik * lck[c]
        # factor the panel in registers (k-ascending, as _chol_cols)
        for c in range(jb, hi):
            for k in range(jb, c):
                sck = s[(c, k)]
                for i in range(c, m):
                    s[(i, c)] = s[(i, c)] - s[(i, k)] * sck
            inv = jax.lax.rsqrt(s[(c, c)])
            for i in range(c, m):
                s[(i, c)] = s[(i, c)] * inv
                l_ref[i * (i + 1) // 2 + c] = s[(i, c)]
            diag.append(s[(c, c)])
    return diag


def _make_read_a(read_t1, p1_ref, jitter, lam, m):
    """Entry reader for ``A = prior1 + lam * sym(stats1) (+ jitter)``.

    ``read_t1(i, j)`` reads the raw statistics entry; ``p1_ref`` is the
    (m, m) prior block in SMEM (scalars broadcast into the particle
    tile); ``None`` means no prior term.
    """

    def read_raw(i, j):
        a = 0.5 * (read_t1(i, j) + read_t1(j, i))
        if lam != 1.0:
            a = a * lam
        if p1_ref is not None:
            a = a + p1_ref[i, j]
        return a

    if not jitter:
        return read_raw

    trace = read_raw(0, 0)
    for i in range(1, m):
        trace = trace + read_raw(i, i)
    bump = (jitter / m) * trace

    def read_a(i, j):
        a = read_raw(i, j)
        if i == j:
            a = a + bump
        return a

    return read_a


def _stat_readers(t0_ref, t1_ref, t2_ref, m, n, flat):
    """Entry readers for structured ((m, n, B)-style) or flat
    ((m*n, B)-style) statistics blocks."""
    if flat:
        return (
            lambda i, c: t0_ref[i * n + c],
            lambda i, j: t1_ref[i * m + j],
            lambda a, b: t2_ref[a * n + b],
        )
    return (
        lambda i, c: t0_ref[i, c],
        lambda i, j: t1_ref[i, j],
        lambda a, b: t2_ref[a, b],
    )


def _packed_readers(s_ref, m, n):
    """Entry readers for the packed statistics layout: ONE ref whose rows
    are ``[T0 (m*n) | tril(T1) (m(m+1)/2) | tril(T2) (n(n+1)/2) | T3 (1)]``
    (see ``mniw.pack_stats_bl``). T1/T2 are stored as COLUMN-major lower
    triangles (they are symmetric by construction); off-triangle reads
    mirror. Returns ``(read_t0, read_t1, read_t2, read_t3)``."""
    o1 = m * n
    o2 = o1 + m * (m + 1) // 2
    o3 = o2 + n * (n + 1) // 2

    def tri(o, i, j, sz):
        hi, lo = (i, j) if i >= j else (j, i)
        return s_ref[o + lo * sz - (lo * (lo - 1)) // 2 + hi - lo]

    return (
        lambda i, c: s_ref[i * n + c],
        lambda i, j: tri(o1, i, j, m),
        lambda a, b: tri(o2, a, b, n),
        lambda: s_ref[o3],
    )


def _factorize_kernel(
    t0_ref, t1_ref, t2_ref, p0_ref, p1_ref, p2_ref,
    chol_ref, white_ref, row_ref, *, m, n, jitter, lam, has_prior
):
    p0 = p0_ref if has_prior else None
    p1 = p1_ref if has_prior else None
    p2 = p2_ref if has_prior else None
    cols = _chol_cols(
        _make_read_a(lambda i, j: t1_ref[i, j], p1, jitter, lam, m), m
    )

    for j in range(m):
        for i in range(m):
            chol_ref[i, j] = cols[j][i]

    def read_t0(i, c):
        a = t0_ref[i, c]
        if lam != 1.0:
            a = a * lam
        if p0 is not None:
            a = a + p0[i, c]
        return a

    def read_t2(a_, b):
        v = t2_ref[a_, b]
        if lam != 1.0:
            v = v * lam
        if p2 is not None:
            v = v + p2[a_, b]
        return v

    # forward substitution: white = L^{-1} T0, column by column of T0
    white = []
    for i in range(m):
        row = []
        for c in range(n):
            acc = read_t0(i, c)
            for k in range(i):
                acc = acc - cols[k][i] * white[k][c]
            row.append(acc / cols[i][i])
        white.append(row)
        for c in range(n):
            white_ref[i, c] = row[c]

    # row_scale = T2 - white^T white
    for a in range(n):
        for b in range(n):
            acc = read_t2(a, b)
            for k in range(m):
                acc = acc - white[k][a] * white[k][b]
            row_ref[a, b] = acc


def _project_kernel(chol_ref, white_ref, phi_ref, mean_ref, col_ref, *, m, n):
    """v = L^{-1} phi; mean = white^T v; col_scale = v.v + 1."""
    v = []
    for i in range(m):
        acc = phi_ref[i]
        for k in range(i):
            acc = acc - chol_ref[i, k] * v[k]
        v.append(acc / chol_ref[i, i])
    for c in range(n):
        acc = white_ref[0, c] * v[0]
        for k in range(1, m):
            acc = acc + white_ref[k, c] * v[k]
        mean_ref[c] = acc
    acc = v[0] * v[0]
    for k in range(1, m):
        acc = acc + v[k] * v[k]
    col_ref[0] = acc + 1.0


def _factorize_project_core(
    raw_t0, raw_t1, raw_t2, phi_ref, p0, p1, p2, *, m, n, jitter, lam,
    l_ref=None,
):
    """Shared factorize+project computation on particle-block values.

    Factors ``P1 + lam*sym(T1) (+jitter)``, forward-substitutes
    ``white = L^{-1}(P0 + lam*T0)`` and ``v = L^{-1} phi``, and returns
    ``(psi, mean, col, half_ld_t1, logdet_psi)`` — the factor stays
    entirely on-chip. With ``l_ref`` (a ``(m(m+1)/2, block)`` VMEM
    scratch) the Cholesky runs panel-blocked through the scratch instead
    of as one all-live SSA expansion — see ``_CHOL_PANEL``. ``phi_ref``
    may be ``None`` (log-base-measure use), in which case ``mean``/``col``
    are ``None``.
    """
    assert n <= 2, "fused project kernels support n <= 2"
    read_a = _make_read_a(raw_t1, p1, jitter, lam, m)
    if l_ref is not None:
        diag = _chol_scratch(read_a, m, l_ref)

        def read_l(i, k):
            return l_ref[i * (i + 1) // 2 + k]
    else:
        cols = _chol_cols(read_a, m)
        diag = [cols[i][i] for i in range(m)]

        def read_l(i, k):
            return cols[k][i]

    half_ld_t1 = jnp.log(diag[0])
    for i in range(1, m):
        half_ld_t1 = half_ld_t1 + jnp.log(diag[i])

    def read_t0(i, c):
        a = raw_t0(i, c)
        if lam != 1.0:
            a = a * lam
        if p0 is not None:
            a = a + p0[i, c]
        return a

    def read_t2(a_, b):
        v_ = raw_t2(a_, b)
        if lam != 1.0:
            v_ = v_ * lam
        if p2 is not None:
            v_ = v_ + p2[a_, b]
        return v_

    # white = L^{-1} T0 and v = L^{-1} phi in one forward substitution
    # pass; each factor entry is read once and reused for all n+1 columns
    white = []
    v = []
    for i in range(m):
        li = [read_l(i, k) for k in range(i)]
        row = []
        for c in range(n):
            acc = read_t0(i, c)
            for k in range(i):
                acc = acc - li[k] * white[k][c]
            row.append(acc / diag[i])
        white.append(row)
        if phi_ref is not None:
            accv = phi_ref[i]
            for k in range(i):
                accv = accv - li[k] * v[k]
            v.append(accv / diag[i])

    psi = [[None] * n for _ in range(n)]
    for a in range(n):
        for b in range(n):
            acc = read_t2(a, b)
            for k in range(m):
                acc = acc - white[k][a] * white[k][b]
            psi[a][b] = acc
    if n == 1:
        logdet_psi = jnp.log(psi[0][0])
    else:
        off = 0.5 * (psi[0][1] + psi[1][0])
        logdet_psi = jnp.log(psi[0][0] * psi[1][1] - off * off)

    if phi_ref is None:
        return psi, white, None, None, half_ld_t1, logdet_psi

    mean = []
    for c in range(n):
        acc = white[0][c] * v[0]
        for k in range(1, m):
            acc = acc + white[k][c] * v[k]
        mean.append(acc)
    acc = v[0] * v[0]
    for k in range(1, m):
        acc = acc + v[k] * v[k]
    col = acc + 1.0
    return psi, white, mean, col, half_ld_t1, logdet_psi


def _factorize_project_kernel(
    t0_ref, t1_ref, t2_ref, p0_ref, p1_ref, p2_ref, phi_ref,
    mean_ref, col_ref, row_ref, ld_ref, l_ref,
    *, m, n, jitter, lam, has_prior, flat,
):
    """Fused factorize + predictive projection with NO m^2-sized outputs.

    Computes ``chol(P1 + lam*sym(T1))`` and ``white = L^{-1}(P0 + lam*T0)``
    entirely in VMEM/registers and emits only the small per-particle
    results: predictive mean ``white^T L^{-1} phi``, column scale
    ``|L^{-1} phi|^2 + 1``, Schur complement ``Psi`` (the predictive row
    scale), and the two log-determinants the marginalized ancestor weights
    need. The factor itself never touches HBM — in the APF step that
    removes ~1.1 ms/step of factor writes/reads/relayouts at N = 32768.
    """
    p0 = p0_ref if has_prior else None
    p1 = p1_ref if has_prior else None
    p2 = p2_ref if has_prior else None
    raw_t0, raw_t1, raw_t2 = _stat_readers(t0_ref, t1_ref, t2_ref, m, n, flat)
    psi, white, mean, col, half_ld_t1, logdet_psi = _factorize_project_core(
        raw_t0, raw_t1, raw_t2, phi_ref, p0, p1, p2,
        m=m, n=n, jitter=jitter, lam=lam, l_ref=l_ref,
    )
    for a in range(n):
        for b in range(n):
            row_ref[a, b] = psi[a][b]
    for c in range(n):
        mean_ref[c] = mean[c]
    col_ref[0] = col
    ld_ref[0] = 2.0 * half_ld_t1
    ld_ref[1] = logdet_psi


def _packed_fp_kernel(
    s_ref, p0_ref, p1_ref, p2_ref, phi_ref,
    mean_ref, col_ref, row_ref, ld_ref, l_ref,
    *, m, n, jitter, lam, has_prior,
):
    """:func:`_factorize_project_kernel` over the packed statistics
    layout (one ref, rows ``[T0|T1|T2|T3]``)."""
    p0 = p0_ref if has_prior else None
    p1 = p1_ref if has_prior else None
    p2 = p2_ref if has_prior else None
    raw_t0, raw_t1, raw_t2, _ = _packed_readers(s_ref, m, n)
    psi, white, mean, col, half_ld_t1, logdet_psi = _factorize_project_core(
        raw_t0, raw_t1, raw_t2, phi_ref, p0, p1, p2,
        m=m, n=n, jitter=jitter, lam=lam, l_ref=l_ref,
    )
    for a in range(n):
        for b in range(n):
            row_ref[a, b] = psi[a][b]
    for c in range(n):
        mean_ref[c] = mean[c]
    col_ref[0] = col
    ld_ref[0] = 2.0 * half_ld_t1
    ld_ref[1] = logdet_psi


def _packed_fp_emit_kernel(
    s_ref, p0_ref, p1_ref, p2_ref, phi_ref,
    mean_ref, col_ref, row_ref, ld_ref, lw_ref,
    *, m, n, jitter, lam, has_prior,
):
    """:func:`_packed_fp_kernel` that ALSO emits the Cholesky factor and
    whitened prior-mean as an output: ``lw_ref`` rows ``[tril(L)
    (m(m+1)/2, row-major i(i+1)/2+k) | white (m*n)]``. The panel-blocked
    Cholesky writes its scratch rows straight into the output block, so
    emitting the factor costs ONE extra HBM write (no extra compute) —
    the factor-reusing draw kernel then skips the O(m^3/6)
    refactorization entirely (see ``_du_factor_gather_kernel``)."""
    p0 = p0_ref if has_prior else None
    p1 = p1_ref if has_prior else None
    p2 = p2_ref if has_prior else None
    raw_t0, raw_t1, raw_t2, _ = _packed_readers(s_ref, m, n)
    psi, white, mean, col, half_ld_t1, logdet_psi = _factorize_project_core(
        raw_t0, raw_t1, raw_t2, phi_ref, p0, p1, p2,
        m=m, n=n, jitter=jitter, lam=lam, l_ref=lw_ref,
    )
    tri = m * (m + 1) // 2
    for i in range(m):
        for c in range(n):
            lw_ref[tri + i * n + c] = white[i][c]
    for a in range(n):
        for b in range(n):
            row_ref[a, b] = psi[a][b]
    for c in range(n):
        mean_ref[c] = mean[c]
    col_ref[0] = col
    ld_ref[0] = 2.0 * half_ld_t1
    ld_ref[1] = logdet_psi


def _du_factor_gather_kernel(
    w_ref, s_win_ref, lw_win_ref, anc_ref, p0_ref, p1_ref, p2_ref,
    phi_ref, u_ref, v_ref, snew_ref, y_ref, ld_ref,
    s_scratch, lw_scratch,
    *, m, n, jitter, lam, p3, has_prior, rows, rows_lw,
):
    """Fused gather + predictive draw + rank-1 update REUSING the factor
    the auxiliary kernel emitted for the same (pre-resampling) statistics.

    Gathers both the packed statistics AND the packed ``[tril(L)|white]``
    columns for each output particle's ancestor, then replaces the
    O(m^3/6)-FLOP refactorization with an O(m^2/2) forward substitution
    ``v = L^{-1} phi`` — the draw kernel's dominant compute term (the
    unrolled Cholesky's register working set spills ~5x over the HBM
    roofline at m = 20). Outputs are bitwise-identical to
    :func:`_draw_update_gather_kernel` (same `_chol_scratch` arithmetic
    produced L/white at the auxiliary step; same substitution order).
    """
    ws = w_ref[pl.program_id(0)] * 128
    _windowed_gather_to_scratch(s_win_ref, anc_ref, ws, s_scratch, rows)
    _windowed_gather_to_scratch(
        lw_win_ref, anc_ref, ws, lw_scratch, rows_lw
    )

    p0 = p0_ref if has_prior else None
    p2 = p2_ref if has_prior else None
    raw_t0, raw_t1, raw_t2, raw_t3 = _packed_readers(s_scratch, m, n)
    tri = m * (m + 1) // 2

    def read_l(i, k):
        return lw_scratch[i * (i + 1) // 2 + k]

    def read_w(i, c):
        return lw_scratch[tri + i * n + c]

    diag = [read_l(i, i) for i in range(m)]
    half_ld_t1 = jnp.log(diag[0])
    for i in range(1, m):
        half_ld_t1 = half_ld_t1 + jnp.log(diag[i])

    # v = L^{-1} phi (the only substitution left in the draw)
    v = []
    for i in range(m):
        accv = phi_ref[i]
        for k in range(i):
            accv = accv - read_l(i, k) * v[k]
        v.append(accv / diag[i])

    def read_t2(a_, b):
        v_ = raw_t2(a_, b)
        if lam != 1.0:
            v_ = v_ * lam
        if p2 is not None:
            v_ = v_ + p2[a_, b]
        return v_

    psi = [[None] * n for _ in range(n)]
    for a in range(n):
        for b in range(n):
            acc = read_t2(a, b)
            for k in range(m):
                acc = acc - read_w(k, a) * read_w(k, b)
            psi[a][b] = acc
    if n == 1:
        logdet_psi = jnp.log(psi[0][0])
    else:
        off = 0.5 * (psi[0][1] + psi[1][0])
        logdet_psi = jnp.log(psi[0][0] * psi[1][1] - off * off)

    mean = []
    for c in range(n):
        acc = read_w(0, c) * v[0]
        for k in range(1, m):
            acc = acc + read_w(k, c) * v[k]
        mean.append(acc)
    acc = v[0] * v[0]
    for k in range(1, m):
        acc = acc + v[k] * v[k]
    col = acc + 1.0

    df = raw_t3() * lam + p3
    df_pred = df + (1.0 - n)

    two_pi = 6.283185307179586
    t = []
    for c in range(n):
        u = 1.0 - u_ref[c]
        r = jnp.sqrt(
            df_pred * (jnp.exp(-(2.0 / df_pred) * jnp.log(u)) - 1.0)
        )
        t.append(r * jnp.cos(two_pi * v_ref[c]))

    inv_df = 1.0 / df_pred
    if n == 1:
        scaled = [jnp.sqrt(psi[0][0] * inv_df) * t[0]]
    else:
        r00 = psi[0][0] * inv_df
        off = 0.5 * (psi[0][1] + psi[1][0]) * inv_df
        r11 = psi[1][1] * inv_df
        l00 = jnp.sqrt(r00)
        l10 = off / l00
        l11 = jnp.sqrt(r11 - l10 * l10)
        scaled = [l00 * t[0], l10 * t[0] + l11 * t[1]]

    sqrt_col = jnp.sqrt(col)
    y = [mean[c] + scaled[c] * sqrt_col for c in range(n)]

    o1 = m * n
    o2 = o1 + m * (m + 1) // 2
    o3 = o2 + n * (n + 1) // 2
    phi = [phi_ref[i] for i in range(m)]
    for i in range(m):
        for c in range(n):
            snew_ref[i * n + c] = raw_t0(i, c) * lam + phi[i] * y[c]
    for j in range(m):
        for i in range(j, m):
            snew_ref[o1 + j * m - (j * (j - 1)) // 2 + i - j] = (
                raw_t1(i, j) * lam + phi[i] * phi[j]
            )
    for b in range(n):
        for a in range(b, n):
            snew_ref[o2 + b * n - (b * (b - 1)) // 2 + a - b] = (
                raw_t2(a, b) * lam + y[a] * y[b]
            )
    snew_ref[o3] = raw_t3() * lam + 1.0
    for c in range(n):
        y_ref[c] = y[c]
    ld_ref[0] = 2.0 * half_ld_t1
    ld_ref[1] = logdet_psi


def _draw_update_tail(
    src_ref, p0_ref, p1_ref, p2_ref, phi_ref, u_ref, v_ref,
    snew_ref, y_ref, ld_ref, l_ref,
    *, m, n, jitter, lam, p3, has_prior,
):
    """Shared tail of the fused draw/update kernels: factorize
    ``prior + lam*stats`` read from ``src_ref`` (the packed-statistics
    block, in whatever buffer the caller staged it), project at ``phi``,
    draw the matrix-t predictive, and write the rank-1-updated packed
    statistics + draw + log-determinants."""
    p0 = p0_ref if has_prior else None
    p1 = p1_ref if has_prior else None
    p2 = p2_ref if has_prior else None
    raw_t0, raw_t1, raw_t2, raw_t3 = _packed_readers(src_ref, m, n)
    psi, white, mean, col, half_ld_t1, logdet_psi = _factorize_project_core(
        raw_t0, raw_t1, raw_t2, phi_ref, p0, p1, p2,
        m=m, n=n, jitter=jitter, lam=lam, l_ref=l_ref,
    )

    # predictive degrees of freedom (sample_projected_bl semantics)
    df = raw_t3() * lam + p3
    df_pred = df + (1.0 - n)

    # polar Student-t draws: t = sqrt(nu*(u^(-2/nu)-1)) * cos(2 pi v)
    two_pi = 6.283185307179586
    t = []
    for c in range(n):
        u = 1.0 - u_ref[c]
        # exp(x)-1 instead of expm1 (not lowered by Mosaic); x >= 0 here
        # and the small-x precision loss is far below sampling noise
        r = jnp.sqrt(
            df_pred * (jnp.exp(-(2.0 / df_pred) * jnp.log(u)) - 1.0)
        )
        t.append(r * jnp.cos(two_pi * v_ref[c]))

    # chol of row_pred = psi / df_pred (n <= 2)
    inv_df = 1.0 / df_pred
    if n == 1:
        scaled = [jnp.sqrt(psi[0][0] * inv_df) * t[0]]
    else:
        r00 = psi[0][0] * inv_df
        off = 0.5 * (psi[0][1] + psi[1][0]) * inv_df
        r11 = psi[1][1] * inv_df
        l00 = jnp.sqrt(r00)
        l10 = off / l00
        l11 = jnp.sqrt(r11 - l10 * l10)
        scaled = [l00 * t[0], l10 * t[0] + l11 * t[1]]

    sqrt_col = jnp.sqrt(col)
    y = [mean[c] + scaled[c] * sqrt_col for c in range(n)]

    # rank-1 update of the RAW statistics (prior never enters the carry);
    # T1/T2 ride the carry as lower triangles — only those rows exist
    o1 = m * n
    o2 = o1 + m * (m + 1) // 2
    o3 = o2 + n * (n + 1) // 2
    phi = [phi_ref[i] for i in range(m)]
    for i in range(m):
        for c in range(n):
            snew_ref[i * n + c] = raw_t0(i, c) * lam + phi[i] * y[c]
    for j in range(m):
        for i in range(j, m):
            snew_ref[o1 + j * m - (j * (j - 1)) // 2 + i - j] = (
                raw_t1(i, j) * lam + phi[i] * phi[j]
            )
    for b in range(n):
        for a in range(b, n):
            snew_ref[o2 + b * n - (b * (b - 1)) // 2 + a - b] = (
                raw_t2(a, b) * lam + y[a] * y[b]
            )
    snew_ref[o3] = raw_t3() * lam + 1.0
    for c in range(n):
        y_ref[c] = y[c]
    ld_ref[0] = 2.0 * half_ld_t1
    ld_ref[1] = logdet_psi


def _draw_update_packed_kernel(
    s_ref, p0_ref, p1_ref, p2_ref, phi_ref, u_ref, v_ref,
    snew_ref, y_ref, ld_ref, l_ref,
    *, m, n, jitter, lam, p3, has_prior,
):
    """Fused matrix-t predictive draw + rank-1 statistics update.

    Factors ``prior + lam*stats``, projects at ``phi``, draws the
    interface variable ``y`` from the matrix-t predictive using the
    rejection-free polar method (``gaussian.student_t``) on the supplied
    uniforms ``u, v (n,)``-rows, and writes the UPDATED packed statistics
    ``lam*stats + suff(y, phi)`` — the draw's m^2-sized factor and the
    rank-1 sufficient-statistics outer products never touch HBM, and the
    statistics update costs no separate read-modify-write pass.
    Emits ``ld = (logdet_T1, logdet_Psi)`` of the factored MNIW for the
    marginalized ancestor-weight terms (cSMC).
    """
    _draw_update_tail(
        s_ref, p0_ref, p1_ref, p2_ref, phi_ref, u_ref, v_ref,
        snew_ref, y_ref, ld_ref, l_ref,
        m=m, n=n, jitter=jitter, lam=lam, p3=p3, has_prior=has_prior,
    )


def _windowed_gather_to_scratch(s_win_ref, anc_ref, ws, scratch_ref, rows):
    """Resampling gather from a lane-window into a particle-tile scratch.

    ``s_win_ref (rows, WIN)`` is the slice of the packed statistics whose
    lanes cover every ancestor of this output block (window start ``ws``
    in lane units, a 128-multiple); ``anc_ref (8, 128)`` holds the block's
    (global) ancestor indices. Writes ``scratch[:, tau, :] = S[:, anc]``
    for each of the 8 output lane-tiles ``tau``.

    Systematic-resampling ancestors are NON-DECREASING, so the ancestors
    of one 128-particle output tile span a handful of 128-lane source
    tiles: for each output tile this slices candidate source tiles out of
    the window (dynamic lane offset) and lane-gathers them over all
    ``rows`` at once (``take_along_axis`` within 128 lanes — the only
    dynamic-gather Mosaic supports), selecting per lane by the ancestor's
    source-tile id. Cost: ``rounds`` = (source tiles spanned by the output
    tile, typically 1-3) tall (rows, 128) gathers per output tile instead
    of an HBM round-trip through XLA's gather (measured 0.51 ms/step of
    1.45 at N = 32768 on v5e).

    The first ``_GATHER_STATIC_ROUNDS`` rounds are STATICALLY unrolled
    (masked no-ops when the span is smaller): a dynamic-trip ``fori``
    costs ~0.65 us/round of loop overhead in Mosaic AND serializes the
    eight per-tile gathers against each other, where the unrolled rounds
    issue as one wide independent stream. Spans beyond the static budget
    (rare: one output tile's ancestors covering more than
    ``_GATHER_STATIC_ROUNDS`` source tiles) divert to a conditional
    dynamic tail loop.
    """
    # the window ref is either a 2-D (rows, win_lanes) lane slice or a
    # 3-D (rows, wt, 128) tile slice of the pre-blocked statistics (the
    # blocked scan carry: no relayout copy between carry and kernel)
    three_d = len(s_win_ref.shape) == 3
    for tau in range(_ROWS):
        a_lo = anc_ref[tau, 0]
        a_hi = anc_ref[tau, 127]
        t_lo = jax.lax.shift_right_logical(a_lo, jnp.int32(7))
        t_hi = jax.lax.shift_right_logical(a_hi, jnp.int32(7))
        # ancestor lane indices relative to the window start
        anc_row = anc_ref[tau, :].reshape(1, 128) - ws
        rel = jnp.broadcast_to(anc_row, (rows, 128))

        win_tiles = s_win_ref.shape[1] if three_d else None
        win_lanes = None if three_d else s_win_ref.shape[1]

        def round_body(k, acc, _t_lo=t_lo, _rel=rel):
            if three_d:
                # window-tile index (ws is tile-aligned), clamped so
                # masked no-op rounds never read past the buffer
                t_idx = jnp.minimum(
                    (_t_lo - ws // 128) + k, win_tiles - 1
                )
                src = s_win_ref[:, t_idx, :]
                off = t_idx * 128
            else:
                # window-relative lane offset of source tile t_lo + k,
                # written as an explicit x128 product so Mosaic can prove
                # alignment; clamped to the window
                off = pl.multiple_of(
                    jnp.minimum(
                        ((_t_lo - ws // 128) + k) * 128, win_lanes - 128
                    ),
                    128,
                )
                src = s_win_ref[:, pl.ds(off, 128)]
            idx = _rel - off  # lane index within the source tile
            take = jnp.take_along_axis(
                src, jnp.clip(idx, 0, 127), axis=1
            )
            return jnp.where((idx >= 0) & (idx < 128), take, acc)

        out = jnp.zeros((rows, 128), s_win_ref.dtype)
        for k in range(_GATHER_STATIC_ROUNDS):
            out = round_body(k, out)
        span = t_hi - t_lo + 1
        scratch_ref[:, tau, :] = out

        @pl.when(span > _GATHER_STATIC_ROUNDS)
        def _tail(_tau=tau, _span=span, _round=round_body):
            cur = scratch_ref[:, _tau, :]
            cur = jax.lax.fori_loop(
                _GATHER_STATIC_ROUNDS, _span, _round, cur
            )
            scratch_ref[:, _tau, :] = cur


def _draw_update_gather_kernel(
    w_ref, s_win_ref, anc_ref, p0_ref, p1_ref, p2_ref, phi_ref, u_ref,
    v_ref, snew_ref, y_ref, ld_ref, scratch_ref, l_ref,
    *, m, n, jitter, lam, p3, has_prior, rows,
):
    """:func:`_draw_update_packed_kernel` with the resampling gather fused
    in: reads the ANCESTOR's packed-statistics column for every output
    particle straight out of a lane-window of the pre-resampling
    statistics, so the gathered statistics never round-trip through HBM
    (the gather + separate kernel read were two of the five HBM passes per
    filter step). ``phi, u, v`` are already in output (post-resampling)
    order. Resampling semantics are those of
    ``/root/reference/src/Filtering.py:28-35`` (systematic, sorted
    ancestors); the wrapper falls back to gather+draw when a block's
    ancestors span more than the window.
    """
    ws = w_ref[pl.program_id(0)] * 128
    _windowed_gather_to_scratch(s_win_ref, anc_ref, ws, scratch_ref, rows)
    _draw_update_tail(
        scratch_ref, p0_ref, p1_ref, p2_ref, phi_ref, u_ref, v_ref,
        snew_ref, y_ref, ld_ref, l_ref,
        m=m, n=n, jitter=jitter, lam=lam, p3=p3, has_prior=has_prior,
    )


def _draw_update_dedup_gather_kernel(
    t_ref, *refs, m, n, jitter, lam, p3, has_prior, rows, wtiles, rtiles,
):
    """:func:`_draw_update_gather_kernel` for DEGENERATE weights: the
    window holds the output block's ``wtiles`` DISTINCT source tiles
    (not a contiguous lane range), staged ``rtiles`` per inner grid step.

    Under degenerate weights (vehicle APF: median ESS ~12 of 32768) a
    block's ancestors can SPAN most of the source array — a handful of
    long offspring runs separated by wide zero-offspring gaps — while
    touching only a few distinct source tiles (measured p95 ~9 per
    1024-output block, spans up to all 256 tiles). The contiguous-window
    kernel can never fit those blocks; this kernel's grid is
    ``(blocks, wtiles // rtiles)`` with ``rtiles`` input refs whose index
    maps read the prefetched per-block distinct-tile ids, so each inner
    step DMAs up to ``rtiles`` needed tiles (Mosaic skips the DMA when a
    ref's tile id repeats — unused slots carry the last real id forward —
    making total DMA ~= the number of distinct (block, tile) incidences,
    <= n_tiles + n_blocks for sorted ancestors: ~1 streaming pass; the
    measured inner-step overhead of ~0.1 us/step is why tiles are staged
    ``rtiles`` at a time instead of one). Staging copies for pad slots
    (slot >= the block's distinct count, prefetched after the tile ids)
    are branch-skipped. Ancestors arrive REMAPPED to rank space
    (``rank_of_tile_in_block * 128 + lane``, see ``dedup_plan``), so the
    per-output-tile gather rounds see a dense window exactly like the
    contiguous kernel's.
    """
    s_refs = refs[:rtiles]
    (anc_ref, p0_ref, p1_ref, p2_ref, phi_ref, u_ref, v_ref,
     snew_ref, y_ref, ld_ref, win_ref, scratch_ref, l_ref) = refs[rtiles:]
    k = pl.program_id(0)
    w = pl.program_id(1)
    nb = pl.num_programs(0)
    dk = t_ref[nb * wtiles + k]

    for j, sref in enumerate(s_refs):
        slot = w * rtiles + j

        @pl.when(slot < dk)
        def _stage(sref=sref, slot=slot):
            win_ref[
                :, pl.ds(pl.multiple_of(slot * _LANES, _LANES), _LANES)
            ] = sref[...]

    @pl.when(w == wtiles // rtiles - 1)
    def _finish():
        _windowed_gather_to_scratch(
            win_ref, anc_ref, jnp.int32(0), scratch_ref, rows
        )
        _draw_update_tail(
            scratch_ref, p0_ref, p1_ref, p2_ref, phi_ref, u_ref, v_ref,
            snew_ref, y_ref, ld_ref, l_ref,
            m=m, n=n, jitter=jitter, lam=lam, p3=p3, has_prior=has_prior,
        )


# window width (in 128-lane tiles) of the fused-gather draw/update kernel:
# ancestors of a 1024-particle output block typically span ~1024-1500
# source lanes (non-decreasing systematic ancestors advance ~1 input per
# output at high ESS); 16 tiles = 2048 lanes minus <=127 alignment slack
# covers that with margin. Blocks that span wider (a long run of
# zero-offspring particles inside one block) take the exact XLA-gather
# fallback via lax.cond in mniw.draw_update_packed_bl.
# lane-window width (in 128-lane tiles) of the fused-gather kernels.
# Wider windows catch more degenerate-weight steps before the XLA-gather
# fallback (vehicle sweep, matched A/B: 16 -> 1.042 ms/step, 32 -> 1.019,
# 48 -> 1.022); 32 keeps the 232-row window at 3.8 MB VMEM.
_GATHER_WINDOW_TILES = int(os.environ.get("BIPK_GATHER_WINDOW", "32"))
# statically-unrolled gather rounds per output tile (see
# _windowed_gather_to_scratch); spans beyond this take a dynamic tail
_GATHER_STATIC_ROUNDS = int(os.environ.get("BIPK_GATHER_STATIC", "2"))


def window_starts(
    ancestors: jax.Array, n_in_padded: int, block: int = _BLOCK,
    window_tiles: int | None = None, align: int = 1,
):
    """Per-output-block window starts (in 128-lane tiles) + whether every
    block's ancestors fit its window. ``ancestors`` is the padded
    non-decreasing ancestor vector (one entry per padded OUTPUT particle,
    values indexing the ``n_in_padded``-column source). ``block`` is the
    kernel's output-block width (1024 for the tiled layout; the cs lane
    block otherwise) and ``window_tiles`` its window width. ``align``
    floors starts to a tile multiple — the blocked (rows, nb, 128) carry
    physically tiles 8 consecutive nb entries, so its windows must start
    at 8-tile boundaries (Mosaic rejects unaligned Element offsets)."""
    nb = ancestors.shape[0] // block
    wt = window_tiles or _GATHER_WINDOW_TILES
    wt = min(wt, n_in_padded // _LANES)
    a = ancestors.reshape(nb, block)
    first = jax.lax.shift_right_logical(a[:, 0], jnp.int32(7))
    last = jax.lax.shift_right_logical(a[:, -1], jnp.int32(7))
    if align > 1:
        first = (first // align) * align
    lim = n_in_padded // _LANES - wt
    if align > 1:
        lim = (lim // align) * align
    w = jnp.clip(first, 0, lim)
    fits = jnp.all(last - w < wt)
    return w.astype(jnp.int32), fits


def gather_plan(m: int, n: int, n_in_padded: int, dtype=jnp.float32):
    """(output block, window tiles, use_cs) of the fused-gather
    draw/update kernel for this workload — shared between the mniw
    dispatch (ancestor padding + fits check) and the kernel launch.

    The cs window budget caps ``rows * window`` VMEM at ~5 MB and keeps
    the window at least one tile wider than the output block (ancestors
    of ``block`` outputs span at least ``block`` source lanes)."""
    rows = m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1
    if not _cs_layout(m):
        # cap the tiled window buffer at ~4 MB VMEM (it coexists with the
        # double-buffered in/out blocks and the factor scratch)
        wt_budget = max(8, (4 * 2**20) // (rows * _LANES * 4))
        wt = min(_GATHER_WINDOW_TILES, wt_budget, n_in_padded // _LANES)
        return _BLOCK, wt, False
    itemsize = jnp.dtype(dtype).itemsize
    lb = _cs_lanes(rows, dtype)
    # the gather kernel holds window + gathered block + factor columns +
    # double-buffered outputs at once — cap the block buffer at ~1 MB
    # (m = 41 at lb = 512 measures 18.5 MB scoped VMEM, over the 16 MB
    # limit; lb = 256 fits)
    while lb > _LANES and rows * lb * itemsize > 2**20:
        lb //= 2
    wt = max(2, min(
        _GATHER_WINDOW_TILES,
        (4 * 2**20 // itemsize) // (rows * _LANES),
    ))
    wt = min(wt, n_in_padded // _LANES)
    while lb > _LANES and wt * _LANES < lb + _LANES:
        lb //= 2
    return lb, wt, True


@functools.partial(
    jax.jit, static_argnames=("jitter", "lam", "p3", "m", "n")
)
def draw_update_gather_packed_blocks(
    S, ancestors, w, phi, u, v, jitter: float, lam: float = 1.0,
    prior=None, p3: float = 0.0, m: int = 0, n: int = 0,
):
    """Fused resampling gather + predictive draw + rank-1 statistics
    update: semantically ``draw_update_packed_blocks(S[:, ancestors], phi,
    u, v, ...)`` with the gather performed inside the kernel (the gathered
    statistics never exist in HBM).

    ``S (rows, N_in)`` packed PRE-resampling statistics;
    ``ancestors (N_out,)`` int32 non-decreasing indices into the source
    columns (``N_out`` may differ from ``N_in`` — microbatched steps
    gather chunk-sized outputs from the full population); ``w`` the
    per-output-block window starts from :func:`window_starts` (callers
    must verify ``fits`` and fall back otherwise); ``phi, u, v`` in
    output order.
    """
    rows = m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1
    assert S.shape[0] == rows, (S.shape, rows)
    blocked = is_blocked(S)
    n_in = blocked_particles(S)
    N = ancestors.shape[-1]
    total_in = -(-n_in // _LANES) * _LANES
    block, wt, use_cs = gather_plan(m, n, total_in, S.dtype)
    if use_cs:
        assert not blocked, "blocked carry requires the tiled layout"
        return _cs_du_gather_call(
            S, ancestors, w, phi, u, v, jitter, lam, prior, p3, m, n,
            rows=rows, block=block, wt=wt, total_in=total_in,
        )

    assert supported(m), f"m={m} exceeds the fused draw-update budget"
    total = -(-N // _BLOCK) * _BLOCK
    grid = (total // _BLOCK,)
    win = min(_GATHER_WINDOW_TILES, total_in // _LANES) * _LANES

    has_prior = prior is not None
    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=S.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), S.dtype)
        p0 = p1 = p2 = zero

    # pad ancestors with the last valid index so padded outputs gather a
    # real column (their draws are discarded by _unblock)
    anc = ancestors.astype(jnp.int32)
    if total != N:
        anc = jnp.pad(anc, (0, total - N), constant_values=n_in - 1)
    anc_blocked = anc.reshape(total // _LANES, _LANES)

    S_pad = S if blocked else _pad_last(S, total_in)
    if blocked:
        if win == total_in:
            s_spec = pl.BlockSpec(
                (rows, total_in // _LANES, _LANES),
                lambda i, w_ref: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            from jax._src.pallas import core as pallas_core

            s_spec = pl.BlockSpec(
                (
                    pallas_core.Element(rows),
                    pallas_core.Element(win // _LANES),
                    pallas_core.Element(_LANES),
                ),
                lambda i, w_ref: (0, pl.multiple_of(w_ref[i], 8), 0),
                memory_space=pltpu.VMEM,
            )
    elif win == total_in:
        # whole (padded) array fits one window: plain full-array spec (no
        # Element indexing; also the interpreter-mode path for CPU CI)
        s_spec = pl.BlockSpec(
            (rows, total_in), lambda i, w_ref: (0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        from jax._src.pallas import core as pallas_core

        s_spec = pl.BlockSpec(
            (pallas_core.Element(rows), pallas_core.Element(win)),
            lambda i, w_ref: (0, pl.multiple_of(w_ref[i] * _LANES, _LANES)),
            memory_space=pltpu.VMEM,
        )

    def vspec(lead):
        zeros = (0,) * len(lead)
        return pl.BlockSpec(
            (*lead, _ROWS, _LANES),
            lambda i, w_ref, _z=zeros: (*_z, i, 0),
            memory_space=pltpu.VMEM,
        )

    def sspec(shape):
        return pl.BlockSpec(
            shape, lambda i, w_ref, _z=(0,) * len(shape): _z,
            memory_space=pltpu.SMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            s_spec,
            vspec(()),
            sspec(p0.shape), sspec(p1.shape), sspec(p2.shape),
            vspec((m,)), vspec((n,)), vspec((n,)),
        ],
        out_specs=[vspec((rows,)), vspec((n,)), vspec((2,))],
        scratch_shapes=[
            pltpu.VMEM((rows, _ROWS, _LANES), S.dtype),
            _l_scratch(m, True, S.dtype),
        ],
    )

    snew, y, ld = _pallas_call(
        functools.partial(
            _draw_update_gather_kernel, m=m, n=n, jitter=jitter, lam=lam,
            p3=p3, has_prior=has_prior, rows=rows,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, total // _LANES, _LANES), S.dtype),
            jax.ShapeDtypeStruct((n, total // _LANES, _LANES), S.dtype),
            jax.ShapeDtypeStruct((2, total // _LANES, _LANES), S.dtype),
        ],
    )(
        w,
        S_pad,
        anc_blocked,
        p0, p1, p2,
        _blockify(phi, total),
        _blockify(u, total),
        _blockify(v, total),
    )
    if not blocked:
        snew = _unblock(snew, N)
    y = _unblock(y, N)
    ld = _unblock(ld, N)
    return snew, y, ld[0], ld[1]


# distinct-tile window width (in 128-lane tiles) of the DEDUP fused-gather
# kernel (degenerate-weight regime): must cover a block's DISTINCT source
# tiles, not its contiguous span. Measured on the vehicle sweep (median
# ESS ~12/32768): per-1024-block distinct tiles p50 1, p95 9, with
# per-step maxima of 20-45 on the worst steps — 32 covers ~3/4 of steps
# at 3.8 MB VMEM for the m = 20 window.
_DEDUP_WINDOW_TILES = int(os.environ.get("BIPK_DEDUP_WINDOW", "32"))
# source refs staged per inner grid step (inner steps cost ~0.1 us each;
# more refs = fewer steps at slightly more live VMEM blocks)
_DEDUP_REFS = int(os.environ.get("BIPK_DEDUP_REFS", "8"))
# the plan's distinct-tile-id recovery is one (n_src_tiles,)-query binary
# search over the sorted ancestors (~30 us at 256 queries); a huge source
# (the chunked 1M-particle mode gathers 32k-chunks from 8192 tiles) would
# scale that cost 32x, so the dedup path stands down there
_DEDUP_MAX_SRC_TILES = int(os.environ.get("BIPK_DEDUP_MAX_SRC_TILES", "1024"))


def dedup_supported(n_in_padded: int) -> bool:
    return n_in_padded // _LANES <= _DEDUP_MAX_SRC_TILES


def dedup_window_tiles(n_in_padded: int) -> int:
    """Distinct-tile budget, rounded up to a whole number of
    ``_DEDUP_REFS``-wide inner steps (pad slots are branch-skipped)."""
    wt = min(_DEDUP_WINDOW_TILES, n_in_padded // _LANES)
    r = min(_DEDUP_REFS, wt)
    return -(-wt // r) * r


def dedup_fits(ancestors: jax.Array, block: int, wtiles: int):
    """Whether every ``block``-output block's ancestors touch at most
    ``wtiles`` DISTINCT source tiles (cheap: no cumsum)."""
    nb = ancestors.shape[0] // block
    at = jax.lax.shift_right_logical(
        ancestors.reshape(nb, block), jnp.int32(7)
    )
    newt = jnp.concatenate(
        [
            jnp.ones((nb, 1), jnp.int32),
            (at[:, 1:] != at[:, :-1]).astype(jnp.int32),
        ],
        axis=1,
    )
    return jnp.all(jnp.sum(newt, axis=1) <= wtiles)


def dedup_plan(ancestors: jax.Array, block: int, wtiles: int, n_tiles: int):
    """Rank-remap sorted ancestors for the dedup-window gather kernel.

    ``ancestors (total,)`` non-decreasing int32 indexing a source of
    ``n_tiles`` 128-lane tiles, ``total % block == 0``. Returns
    ``(local_anc (total,), plan (nblocks*wtiles + nblocks,))`` where
    ``plan[k*wtiles + j]`` is the j-th distinct source tile of block k
    (slots past the block's distinct count repeat the last real tile so
    consecutive kernel grid steps skip the DMA), the trailing ``nblocks``
    entries are each block's distinct-tile count (the kernel skips pad
    slots' staging copies), and
    ``local_anc = rank_of_tile_within_block * 128 + lane_within_tile``.
    Only valid for blocks satisfying :func:`dedup_fits`.

    Closed-form via GLOBAL tile ranks — sorted ancestors mean a block's
    distinct tiles are a CONTIGUOUS range of the global distinct-tile
    list, so per-position ranks come from ONE global cumsum of the
    tile-change flags (measured free at N = 32768 on v5e) and the tile
    ids from one (n_tiles,)-query binary search over the sorted
    ancestors (~30 us). Formulations that looked cheaper on paper
    measured far worse: a per-block cumsum + block-wide searchsorted
    cost 184 us/call, and an N-element ``take`` from a 256-entry rank
    table costs 274 us on its own (TPU XLA gathers pay per element) —
    everything here is elementwise, strided slicing, or tiny.
    """
    a = ancestors
    nb = a.shape[0] // block
    at_flat = jax.lax.shift_right_logical(a, jnp.int32(7))
    newt = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (at_flat[1:] != at_flat[:-1]).astype(jnp.int32),
        ]
    )
    # global rank of each POSITION's tile among the distinct tiles seen
    gr_flat = jnp.cumsum(newt) - 1
    gr = gr_flat.reshape(nb, block)
    g_lo = gr[:, 0]
    g_hi = gr[:, -1]
    dk = g_hi - g_lo + 1
    ab = a.reshape(nb, block)
    local = (gr - g_lo[:, None]) * _LANES + (ab & (_LANES - 1))
    # gt[r] = tile id of the r-th distinct tile: first position whose
    # rank reaches r, read back through the sorted ancestors
    pos = jnp.searchsorted(
        gr_flat, jnp.arange(min(n_tiles, a.shape[0]), dtype=jnp.int32)
    )
    gt = jax.lax.shift_right_logical(
        jnp.take(a, pos, mode="clip"), jnp.int32(7)
    )
    slots = jnp.minimum(
        g_lo[:, None] + jnp.arange(wtiles, dtype=jnp.int32)[None, :],
        g_hi[:, None],
    )
    tids = jnp.take(gt, slots.reshape(-1)).reshape(nb, wtiles)
    # forward-fill pad slots (j >= dk) from the PREVIOUS block's slot j:
    # a pad slot whose id changes across blocks still fires its ref's DMA
    # even though the staging copy is skipped — with per-block clamping,
    # every block transition re-fetched the same clamped tile once per
    # pad ref (~4x read amplification under degenerate weights). A
    # 32-step scan over (wtiles,) rows is free.
    valid = (
        jnp.arange(wtiles, dtype=jnp.int32)[None, :] < dk[:, None]
    )

    def _ff(prev, row):
        v, t = row
        cur = jnp.where(v, t, prev)
        return cur, cur

    _, tids = jax.lax.scan(_ff, tids[0], (valid, tids))
    return (
        local.reshape(-1),
        jnp.concatenate(
            [tids.reshape(-1).astype(jnp.int32), dk.astype(jnp.int32)]
        ),
    )


@functools.partial(
    jax.jit, static_argnames=("jitter", "lam", "p3", "m", "n", "wtiles")
)
def draw_update_dedup_gather_packed_blocks(
    S, local_anc, tids, phi, u, v, jitter: float, lam: float = 1.0,
    prior=None, p3: float = 0.0, m: int = 0, n: int = 0, wtiles: int = 0,
):
    """Degenerate-weight-regime fused resampling gather + draw + update:
    semantically ``draw_update_packed_blocks(S[:, ancestors], ...)`` where
    ``local_anc, tids = dedup_plan(ancestors, ...)``. The kernel's 2-D
    grid ``(blocks, wtiles)`` stages each output block's distinct source
    tiles into a VMEM window via the prefetched tile ids; total HBM read
    is ~one streaming pass over the touched statistics regardless of the
    ancestor SPAN (the contiguous-window kernel's limit), replacing the
    4-pass XLA gather+draw fallback on the ~2/3 of vehicle-sweep steps
    whose weights are degenerate. Tiled layout only (m <= 24).
    """
    rows = m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1
    assert S.shape[0] == rows, (S.shape, rows)
    assert supported(m), f"m={m} exceeds the fused draw-update budget"
    n_in = S.shape[-1]
    N = local_anc.shape[-1]
    total_in = -(-n_in // _LANES) * _LANES
    assert N % _BLOCK == 0, (N, _BLOCK)
    assert tids.shape == (N // _BLOCK * (wtiles + 1),), (
        tids.shape, N, wtiles,
    )
    rtiles = min(_DEDUP_REFS, wtiles)
    assert wtiles % rtiles == 0, (wtiles, rtiles)
    grid = (N // _BLOCK, wtiles // rtiles)

    has_prior = prior is not None
    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=S.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), S.dtype)
        p0 = p1 = p2 = zero

    anc_blocked = local_anc.astype(jnp.int32).reshape(N // _LANES, _LANES)
    S_pad = _pad_last(S, total_in)

    s_specs = [
        pl.BlockSpec(
            (rows, _LANES),
            lambda k, w, t_ref, _j=j: (
                0, t_ref[k * wtiles + w * rtiles + _j]
            ),
            memory_space=pltpu.VMEM,
        )
        for j in range(rtiles)
    ]

    def vspec(lead):
        zeros = (0,) * len(lead)
        return pl.BlockSpec(
            (*lead, _ROWS, _LANES),
            lambda k, w, t_ref, _z=zeros: (*_z, k, 0),
            memory_space=pltpu.VMEM,
        )

    def sspec(shape):
        return pl.BlockSpec(
            shape, lambda k, w, t_ref, _z=(0,) * len(shape): _z,
            memory_space=pltpu.SMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            *s_specs,
            vspec(()),
            sspec(p0.shape), sspec(p1.shape), sspec(p2.shape),
            vspec((m,)), vspec((n,)), vspec((n,)),
        ],
        out_specs=[vspec((rows,)), vspec((n,)), vspec((2,))],
        scratch_shapes=[
            pltpu.VMEM((rows, wtiles * _LANES), S.dtype),
            pltpu.VMEM((rows, _ROWS, _LANES), S.dtype),
            _l_scratch(m, True, S.dtype),
        ],
    )

    snew, y, ld = _pallas_call(
        functools.partial(
            _draw_update_dedup_gather_kernel, m=m, n=n, jitter=jitter,
            lam=lam, p3=p3, has_prior=has_prior, rows=rows, wtiles=wtiles,
            rtiles=rtiles,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, N // _LANES, _LANES), S.dtype),
            jax.ShapeDtypeStruct((n, N // _LANES, _LANES), S.dtype),
            jax.ShapeDtypeStruct((2, N // _LANES, _LANES), S.dtype),
        ],
    )(
        tids,
        *([S_pad] * rtiles),
        anc_blocked,
        p0, p1, p2,
        _blockify(phi, N),
        _blockify(u, N),
        _blockify(v, N),
    )
    snew = _unblock(snew, N)
    y = _unblock(y, N)
    ld = _unblock(ld, N)
    return snew, y, ld[0], ld[1]


@functools.partial(
    jax.jit, static_argnames=("jitter", "lam", "p3", "m", "n")
)
def draw_update_factor_gather_packed_blocks(
    S, LW, ancestors, w, phi, u, v, jitter: float, lam: float = 1.0,
    prior=None, p3: float = 0.0, m: int = 0, n: int = 0,
):
    """:func:`draw_update_gather_packed_blocks` reusing the auxiliary
    kernel's emitted factor ``LW (m(m+1)/2 + m*n, N_in)`` instead of
    refactorizing — both the statistics and the factor columns gather
    inside the kernel (see ``_du_factor_gather_kernel``)."""
    rows = m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1
    rows_lw = m * (m + 1) // 2 + m * n
    assert S.shape[0] == rows and LW.shape[0] == rows_lw
    n_in = S.shape[-1]
    N = ancestors.shape[-1]
    assert supported_factor(m), f"m={m} beyond the factor-reuse budget"
    total = -(-N // _BLOCK) * _BLOCK
    grid = (total // _BLOCK,)
    total_in = -(-n_in // _LANES) * _LANES
    win = min(_GATHER_WINDOW_TILES, total_in // _LANES) * _LANES

    has_prior = prior is not None
    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=S.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), S.dtype)
        p0 = p1 = p2 = zero

    anc = ancestors.astype(jnp.int32)
    if total != N:
        anc = jnp.pad(anc, (0, total - N), constant_values=n_in - 1)
    anc_blocked = anc.reshape(total // _LANES, _LANES)

    S_pad = _pad_last(S, total_in)
    LW_pad = _pad_last(LW, total_in)

    def win_spec(r):
        if win == total_in:
            return pl.BlockSpec(
                (r, total_in), lambda i, w_ref: (0, 0),
                memory_space=pltpu.VMEM,
            )
        from jax._src.pallas import core as pallas_core

        return pl.BlockSpec(
            (pallas_core.Element(r), pallas_core.Element(win)),
            lambda i, w_ref: (
                0, pl.multiple_of(w_ref[i] * _LANES, _LANES)
            ),
            memory_space=pltpu.VMEM,
        )

    def vspec(lead):
        zeros = (0,) * len(lead)
        return pl.BlockSpec(
            (*lead, _ROWS, _LANES),
            lambda i, w_ref, _z=zeros: (*_z, i, 0),
            memory_space=pltpu.VMEM,
        )

    def sspec(shape):
        return pl.BlockSpec(
            shape, lambda i, w_ref, _z=(0,) * len(shape): _z,
            memory_space=pltpu.SMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            win_spec(rows),
            win_spec(rows_lw),
            vspec(()),
            sspec(p0.shape), sspec(p1.shape), sspec(p2.shape),
            vspec((m,)), vspec((n,)), vspec((n,)),
        ],
        out_specs=[vspec((rows,)), vspec((n,)), vspec((2,))],
        scratch_shapes=[
            pltpu.VMEM((rows, _ROWS, _LANES), S.dtype),
            pltpu.VMEM((rows_lw, _ROWS, _LANES), S.dtype),
        ],
    )

    snew, y, ld = _pallas_call(
        functools.partial(
            _du_factor_gather_kernel, m=m, n=n, jitter=jitter, lam=lam,
            p3=p3, has_prior=has_prior, rows=rows, rows_lw=rows_lw,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, total // _LANES, _LANES), S.dtype),
            jax.ShapeDtypeStruct((n, total // _LANES, _LANES), S.dtype),
            jax.ShapeDtypeStruct((2, total // _LANES, _LANES), S.dtype),
        ],
    )(
        w,
        S_pad,
        LW_pad,
        anc_blocked,
        p0, p1, p2,
        _blockify(phi, total),
        _blockify(u, total),
        _blockify(v, total),
    )
    snew = _unblock(snew, N)
    y = _unblock(y, N)
    ld = _unblock(ld, N)
    return snew, y, ld[0], ld[1]


def _log_base_measure_kernel(
    t0_ref, t1_ref, t2_ref, out_ref, l_ref, *, m, n, jitter, flat=False
):
    """Log-determinant pieces of the MNIW base measure (no nu terms).

    Writes ``out[0] = logdet(sym(T1))`` and ``out[1] = logdet(Psi)`` with
    ``Psi = T2 - T0^T sym(T1)^{-1} T0``. Restricted to ``n <= 2`` (every
    workload has 1-2 output dims); callers fall back to the XLA path above.
    """
    assert n <= 2, "pallas log_base_measure supports n <= 2"
    raw_t0, raw_t1, raw_t2 = _stat_readers(t0_ref, t1_ref, t2_ref, m, n, flat)
    psi, _, _, _, half_logdet_t1, logdet_psi = _factorize_project_core(
        raw_t0, raw_t1, raw_t2, None, None, None, None,
        m=m, n=n, jitter=jitter, lam=1.0, l_ref=l_ref,
    )
    out_ref[0] = 2.0 * half_logdet_t1
    out_ref[1] = logdet_psi


def _packed_lbm_kernel(
    s_ref, p0_ref, p1_ref, p2_ref, out_ref, l_ref,
    *, m, n, jitter, has_prior,
):
    """:func:`_log_base_measure_kernel` over the packed layout, with the
    (small) prior/reference offset folded in — the full
    ``prior + ref + stats`` sum is never materialized in HBM."""
    assert n <= 2, "pallas log_base_measure supports n <= 2"
    p0 = p0_ref if has_prior else None
    p1 = p1_ref if has_prior else None
    p2 = p2_ref if has_prior else None
    raw_t0, raw_t1, raw_t2, _ = _packed_readers(s_ref, m, n)
    psi, _, _, _, half_logdet_t1, logdet_psi = _factorize_project_core(
        raw_t0, raw_t1, raw_t2, None, p0, p1, p2,
        m=m, n=n, jitter=jitter, lam=1.0, l_ref=l_ref,
    )
    out_ref[0] = 2.0 * half_logdet_t1
    out_ref[1] = logdet_psi


def _l_scratch(m, tiled, dtype):
    """VMEM scratch for the panel-blocked Cholesky factor: packed
    lower-triangle rows over one particle block (see ``_chol_scratch``)."""
    tri = m * (m + 1) // 2
    shape = (tri, _ROWS, _LANES) if tiled else (tri, _BLOCK_1D)
    return pltpu.VMEM(shape, dtype)


def _smem_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.SMEM)


@functools.partial(jax.jit, static_argnames=("jitter", "lam"))
def factorize_blocks(T0, T1, T2, jitter: float, lam: float = 1.0,
                     prior=None):
    """Fused ``chol(P1 + lam*sym(T1) + jitter) / white / row_scale``.

    ``T0 (m, n, N)``, ``T1 (m, m, N)``, ``T2 (n, n, N)`` ->
    ``(chol (m, m, N), white (m, n, N), row_scale (n, n, N))`` of the MNIW
    ``prior + lam * stats`` (``prior`` an optional tuple of unbatched
    ``(P0 (m, n), P1 (m, m), P2 (n, n))``; folding it here avoids
    materializing the ``prior + stats`` temporaries in HBM).
    """
    m, n, N = T0.shape[0], T0.shape[1], T0.shape[-1]
    assert supported(m), f"m={m} exceeds the fused-kernel VMEM budget"
    total = -(-N // _BLOCK) * _BLOCK
    grid = (total // _BLOCK,)

    has_prior = prior is not None
    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=T1.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), T1.dtype)
        p0 = p1 = p2 = zero
    prior_specs = [
        _smem_spec(p0.shape), _smem_spec(p1.shape), _smem_spec(p2.shape)
    ]

    chol, white, row = _pallas_call(
        functools.partial(
            _factorize_kernel, m=m, n=n, jitter=jitter, lam=lam,
            has_prior=has_prior,
        ),
        grid=grid,
        in_specs=[
            _spec((m, n)), _spec((m, m)), _spec((n, n)),
            *prior_specs,
        ],
        out_specs=[_spec((m, m)), _spec((m, n)), _spec((n, n))],
        out_shape=[
            jax.ShapeDtypeStruct(_blockify(T1, total).shape, T1.dtype),
            jax.ShapeDtypeStruct(_blockify(T0, total).shape, T0.dtype),
            jax.ShapeDtypeStruct(_blockify(T2, total).shape, T2.dtype),
        ],
    )(
        _blockify(T0, total),
        _blockify(T1, total),
        _blockify(T2, total),
        p0, p1, p2,
    )
    return (_unblock(chol, N), _unblock(white, N), _unblock(row, N))


@functools.partial(jax.jit, static_argnames=("jitter", "lam", "m", "n"))
def factorize_project_blocks(T0, T1, T2, phi, jitter: float,
                             lam: float = 1.0, prior=None,
                             m: int | None = None, n: int | None = None):
    """Fused factorization + predictive projection (see
    ``_factorize_project_kernel``). ``phi (m, N)`` ->
    ``(mean (n, N), col_scale (N,), row_scale (n, n, N),
    logdet_T1 (N,), logdet_Psi (N,))``. Statistics may be structured
    (``(m, n, N)`` etc.) or flat (``(m*n, N)`` etc.; pass ``m``/``n``)."""
    flat = T0.ndim == 2
    if not flat:
        m, n = T0.shape[0], T0.shape[1]
    N = T0.shape[-1]
    assert supported_small_out(m), f"m={m} exceeds the fused-kernel budget"
    tiled = supported(m)
    block = _BLOCK if tiled else _BLOCK_1D
    total = -(-N // block) * block
    grid = (total // block,)

    def shp(*lead):
        if tiled:
            return (*lead, total // _LANES, _LANES)
        return (*lead, total)

    has_prior = prior is not None
    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=T1.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), T1.dtype)
        p0 = p1 = p2 = zero
    prior_specs = [
        _smem_spec(p0.shape), _smem_spec(p1.shape), _smem_spec(p2.shape)
    ]

    if flat:
        stat_specs = [
            _spec((m * n,), tiled), _spec((m * m,), tiled),
            _spec((n * n,), tiled),
        ]
    else:
        stat_specs = [
            _spec((m, n), tiled), _spec((m, m), tiled), _spec((n, n), tiled)
        ]
    mean, col, row, ld = _pallas_call(
        functools.partial(
            _factorize_project_kernel, m=m, n=n, jitter=jitter, lam=lam,
            has_prior=has_prior, flat=flat,
        ),
        grid=grid,
        in_specs=[
            *stat_specs,
            *prior_specs, _spec((m,), tiled),
        ],
        out_specs=[
            _spec((n,), tiled), _spec((1,), tiled), _spec((n, n), tiled),
            _spec((2,), tiled),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shp(n), T0.dtype),
            jax.ShapeDtypeStruct(shp(1), T0.dtype),
            jax.ShapeDtypeStruct(shp(n, n), T2.dtype),
            jax.ShapeDtypeStruct(shp(2), T1.dtype),
        ],
        scratch_shapes=[_l_scratch(m, tiled, T1.dtype)],
    )(
        _blockify(T0, total, tiled),
        _blockify(T1, total, tiled),
        _blockify(T2, total, tiled),
        p0, p1, p2,
        _blockify(phi, total, tiled),
    )
    mean = _unblock(mean, N, tiled)
    col = _unblock(col, N, tiled)[0]
    row = _unblock(row, N, tiled)
    ld = _unblock(ld, N, tiled)
    return mean, col, row, ld[0], ld[1]


@jax.jit
def project_blocks(chol, white, phi):
    """Fused ``v = chol^{-1} phi``; ``mean = white^T v``;
    ``col_scale = v.v + 1`` -> ``(mean (n, N), col_scale (N,))``."""
    m, n, N = white.shape[0], white.shape[1], white.shape[-1]
    assert supported(m), f"m={m} exceeds the fused-kernel VMEM budget"
    total = -(-N // _BLOCK) * _BLOCK
    grid = (total // _BLOCK,)

    mean, col = _pallas_call(
        functools.partial(_project_kernel, m=m, n=n),
        grid=grid,
        in_specs=[_spec((m, m)), _spec((m, n)), _spec((m,))],
        out_specs=[_spec((n,)), _spec((1,))],
        out_shape=[
            jax.ShapeDtypeStruct((n, total // _LANES, _LANES), phi.dtype),
            jax.ShapeDtypeStruct((1, total // _LANES, _LANES), phi.dtype),
        ],
    )(
        _blockify(chol, total),
        _blockify(white, total),
        _blockify(phi, total),
    )
    return _unblock(mean, N), _unblock(col, N)[0]


@functools.partial(
    jax.jit, static_argnames=("jitter", "lam", "m", "n", "emit_factor")
)
def factorize_project_packed(S, phi, jitter: float, lam: float = 1.0,
                             prior=None, m: int = 0, n: int = 0,
                             emit_factor: bool = False):
    """:func:`factorize_project_blocks` over packed statistics.

    ``S (m*n + m(m+1)/2 + n(n+1)/2 + 1, N)`` (rows
    ``[T0|tril(T1)|tril(T2)|T3]``), ``phi (m, N)`` ->
    ``(mean (n, N), col_scale (N,), row_scale (n, n, N), logdet_T1 (N,),
    logdet_Psi (N,))``. ONE input operand instead of three — the packed
    scan carry feeds the kernel without any split/relayout.

    With ``emit_factor`` (tiled layout only, ``supported_factor(m)``) a
    sixth output ``LW (m(m+1)/2 + m*n, N)`` carries the Cholesky factor
    (row-major lower rows) and the whitened prior-mean for reuse by the
    factor-consuming draw kernel.
    """
    rows = m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1
    assert S.shape[0] == rows, (S.shape, rows)
    N = blocked_particles(S)
    assert supported_small_out(m), f"m={m} exceeds the fused-kernel budget"

    has_prior = prior is not None
    if _cs_layout(m):
        assert not is_blocked(S), "blocked carry requires the tiled layout"
        assert not emit_factor, "emit_factor requires the tiled layout"
        lb = _cs_lanes(rows, S.dtype)
        if has_prior:
            ppk = _cs_pack_prior(*prior, m, n, rows, S.dtype)
        else:
            ppk = jnp.zeros((rows, 1), S.dtype)
        mean, col, row, ld = _cs_call(
            functools.partial(
                _cs_fp_kernel, m=m, n=n, jitter=jitter, lam=lam,
                has_prior=has_prior,
            ),
            S, ppk, [(phi, m)], [n, 1, n * n, 2], rows=rows, lb=lb, N=N,
        )
        return mean, col[0], row.reshape(n, n, N), ld[0], ld[1]

    tiled = supported(m)
    assert tiled or not emit_factor, "emit_factor requires m <= 24"
    block = _BLOCK if tiled else _BLOCK_1D
    total = -(-N // block) * block
    grid = (total // block,)

    def shp(*lead):
        if tiled:
            return (*lead, total // _LANES, _LANES)
        return (*lead, total)

    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=S.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), S.dtype)
        p0 = p1 = p2 = zero
    prior_specs = [
        _smem_spec(p0.shape), _smem_spec(p1.shape), _smem_spec(p2.shape)
    ]

    rows_lw = m * (m + 1) // 2 + m * n
    kernel = _packed_fp_emit_kernel if emit_factor else _packed_fp_kernel
    out_specs = [
        _spec((n,), tiled), _spec((1,), tiled), _spec((n, n), tiled),
        _spec((2,), tiled),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(shp(n), S.dtype),
        jax.ShapeDtypeStruct(shp(1), S.dtype),
        jax.ShapeDtypeStruct(shp(n, n), S.dtype),
        jax.ShapeDtypeStruct(shp(2), S.dtype),
    ]
    if emit_factor:
        out_specs.append(_spec((rows_lw,), tiled))
        out_shape.append(jax.ShapeDtypeStruct(shp(rows_lw), S.dtype))
        scratch = []
    else:
        scratch = [_l_scratch(m, tiled, S.dtype)]

    outs = _pallas_call(
        functools.partial(
            kernel, m=m, n=n, jitter=jitter, lam=lam,
            has_prior=has_prior,
        ),
        grid=grid,
        in_specs=[
            _spec((rows,), tiled),
            *prior_specs, _spec((m,), tiled),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(
        _blockify(S, total, tiled),
        p0, p1, p2,
        _blockify(phi, total, tiled),
    )
    mean = _unblock(outs[0], N, tiled)
    col = _unblock(outs[1], N, tiled)[0]
    row = _unblock(outs[2], N, tiled)
    ld = _unblock(outs[3], N, tiled)
    if emit_factor:
        return mean, col, row, ld[0], ld[1], _unblock(outs[4], N, tiled)
    return mean, col, row, ld[0], ld[1]


@functools.partial(
    jax.jit, static_argnames=("jitter", "lam", "p3", "m", "n")
)
def draw_update_packed_blocks(S, phi, u, v, jitter: float, lam: float = 1.0,
                              prior=None, p3: float = 0.0,
                              m: int = 0, n: int = 0):
    """Fused predictive draw + rank-1 statistics update (see
    ``_draw_update_packed_kernel``).

    ``S (rows, N)`` packed statistics, ``phi (m, N)``, ``u, v (n, N)``
    uniforms -> ``(S_new (rows, N), y (n, N), logdet_T1 (N,),
    logdet_Psi (N,))``. ``p3`` is the prior's scalar T3 (degrees of
    freedom offset). ``supported(m)`` uses the full-tile layout; larger
    m up to ``supported_small_out(m)`` (toy m=40, SMO m=41) uses the 1-D
    ``(512,)`` block layout — one sublane of VPU width, but the fused
    kernel still beats the unpack->unrolled-XLA fallback by ~10x.
    """
    rows = m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1
    assert S.shape[0] == rows, (S.shape, rows)
    N = blocked_particles(S)
    assert supported_small_out(m), (
        f"m={m} exceeds the fused draw-update budget"
    )

    has_prior = prior is not None
    if _cs_layout(m):
        assert not is_blocked(S), "blocked carry requires the tiled layout"
        lb = _cs_lanes(rows, S.dtype)
        if has_prior:
            ppk = _cs_pack_prior(*prior, m, n, rows, S.dtype)
        else:
            ppk = jnp.zeros((rows, 1), S.dtype)
        snew, y, ld = _cs_call(
            functools.partial(
                _cs_du_kernel, m=m, n=n, jitter=jitter, lam=lam,
                p3=p3, has_prior=has_prior,
            ),
            S, ppk, [(phi, m), (u, n), (v, n)], [rows, n, 2],
            rows=rows, lb=lb, N=N,
        )
        return snew, y, ld[0], ld[1]

    tiled = supported(m)
    block = _BLOCK if tiled else _BLOCK_1D
    total = -(-N // block) * block
    grid = (total // block,)

    def shp(*lead):
        if tiled:
            return (*lead, total // _LANES, _LANES)
        return (*lead, total)

    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=S.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), S.dtype)
        p0 = p1 = p2 = zero
    prior_specs = [
        _smem_spec(p0.shape), _smem_spec(p1.shape), _smem_spec(p2.shape)
    ]

    snew, y, ld = _pallas_call(
        functools.partial(
            _draw_update_packed_kernel, m=m, n=n, jitter=jitter, lam=lam,
            p3=p3, has_prior=has_prior,
        ),
        grid=grid,
        in_specs=[
            _spec((rows,), tiled),
            *prior_specs,
            _spec((m,), tiled), _spec((n,), tiled), _spec((n,), tiled),
        ],
        out_specs=[
            _spec((rows,), tiled), _spec((n,), tiled), _spec((2,), tiled),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shp(rows), S.dtype),
            jax.ShapeDtypeStruct(shp(n), S.dtype),
            jax.ShapeDtypeStruct(shp(2), S.dtype),
        ],
        scratch_shapes=[_l_scratch(m, tiled, S.dtype)],
    )(
        _blockify(S, total, tiled),
        p0, p1, p2,
        _blockify(phi, total, tiled),
        _blockify(u, total, tiled),
        _blockify(v, total, tiled),
    )
    if not is_blocked(S):
        snew = _unblock(snew, N, tiled)
    y = _unblock(y, N, tiled)
    ld = _unblock(ld, N, tiled)
    return snew, y, ld[0], ld[1]


@functools.partial(jax.jit, static_argnames=("jitter", "m", "n"))
def log_base_measure_packed_logdets(S, jitter: float, prior=None,
                                    m: int = 0, n: int = 0):
    """Log-determinant pieces over packed statistics with the prior (or
    prior+reference offset) folded in: ``(logdet_T1, logdet_Psi)`` of
    ``prior + stats``, each ``(N,)``."""
    rows = m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1
    assert S.shape[0] == rows, (S.shape, rows)
    N = S.shape[-1]
    assert supported_small_out(m), f"m={m} exceeds the fused-kernel budget"

    has_prior = prior is not None
    if _cs_layout(m):
        lb = _cs_lanes(rows, S.dtype)
        if has_prior:
            ppk = _cs_pack_prior(*prior, m, n, rows, S.dtype)
        else:
            ppk = jnp.zeros((rows, 1), S.dtype)
        (out,) = _cs_call(
            functools.partial(
                _cs_lbm_kernel, m=m, n=n, jitter=jitter,
                has_prior=has_prior,
            ),
            S, ppk, [], [2], rows=rows, lb=lb, N=N,
        )
        return out[0], out[1]

    tiled = supported(m)
    block = _BLOCK if tiled else _BLOCK_1D
    total = -(-N // block) * block
    grid = (total // block,)
    out_shape = (
        (2, total // _LANES, _LANES) if tiled else (2, total)
    )

    if has_prior:
        p0, p1, p2 = (jnp.asarray(p, dtype=S.dtype) for p in prior)
    else:
        zero = jnp.zeros((1, 1), S.dtype)
        p0 = p1 = p2 = zero
    prior_specs = [
        _smem_spec(p0.shape), _smem_spec(p1.shape), _smem_spec(p2.shape)
    ]

    out = _pallas_call(
        functools.partial(
            _packed_lbm_kernel, m=m, n=n, jitter=jitter,
            has_prior=has_prior,
        ),
        grid=grid,
        in_specs=[_spec((rows,), tiled), *prior_specs],
        out_specs=_spec((2,), tiled),
        out_shape=jax.ShapeDtypeStruct(out_shape, S.dtype),
        scratch_shapes=[_l_scratch(m, tiled, S.dtype)],
    )(_blockify(S, total, tiled), p0, p1, p2)
    out = _unblock(out, N, tiled)
    return out[0], out[1]


@functools.partial(jax.jit, static_argnames=("jitter", "m", "n"))
def log_base_measure_logdets(T0, T1, T2, jitter: float,
                             m: int | None = None, n: int | None = None):
    """Fused log-determinant pieces: returns ``(logdet_T1, logdet_Psi)``
    each ``(N,)`` where ``Psi = T2 - T0^T sym(T1)^{-1} T0``. Statistics
    may be structured or flat (pass ``m``/``n``)."""
    flat = T0.ndim == 2
    if not flat:
        m, n = T0.shape[0], T0.shape[1]
    N = T0.shape[-1]
    assert supported_small_out(m), f"m={m} exceeds the fused-kernel budget"
    tiled = supported(m)
    block = _BLOCK if tiled else _BLOCK_1D
    total = -(-N // block) * block
    grid = (total // block,)
    out_shape = (
        (2, total // _LANES, _LANES) if tiled else (2, total)
    )

    if flat:
        stat_specs = [
            _spec((m * n,), tiled), _spec((m * m,), tiled),
            _spec((n * n,), tiled),
        ]
    else:
        stat_specs = [
            _spec((m, n), tiled), _spec((m, m), tiled), _spec((n, n), tiled)
        ]
    out = _pallas_call(
        functools.partial(
            _log_base_measure_kernel, m=m, n=n, jitter=jitter, flat=flat
        ),
        grid=grid,
        in_specs=stat_specs,
        out_specs=_spec((2,), tiled),
        out_shape=jax.ShapeDtypeStruct(out_shape, T1.dtype),
        scratch_shapes=[_l_scratch(m, tiled, T1.dtype)],
    )(
        _blockify(T0, total, tiled),
        _blockify(T1, total, tiled),
        _blockify(T2, total, tiled),
    )
    out = _unblock(out, N, tiled)
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Column-on-sublanes ("cs") kernels.
#
# The tiled kernels above shape every per-particle scalar as a full
# (8, 128) tile — 1024 particles per value, maximal VPU width per op, but
# the unrolled Cholesky then holds m(m+1)/2 such values live (~210 vregs
# at m = 20), far past the register file: Mosaic spills, and the kernel
# runs ~5x over its HBM roofline (measured 380 us vs 74 us for the m = 20
# draw/update at N = 32768 on v5e).
#
# The cs layout keeps particles on LANES ONLY and puts the MATRIX
# DIMENSION on sublanes: a Cholesky column j is ONE (m-j, LB) value
# (ceil((m-j)/8) vregs), the whole factor ~m^2/16 vregs (~27 at m = 20) —
# no spills. Each FMA covers a full column, so the m^3/6 per-particle
# flops cost ~sum_j j*ceil((m-j)/8) vector ops per 128 lanes (~34%
# sublane-padding overhead) but execute straight out of registers. The
# packed statistics store T1/T2 as COLUMN-major lower triangles (see
# ``mniw._tri_pack_idx``), so A's column j is a CONTIGUOUS static
# sublane slice of the packed block — no in-kernel relayout.
# ---------------------------------------------------------------------------

# The cs layout needs no m^2-sized values, so one VMEM budget covers all
# kernels; lane-block width shrinks for tall (large-m) packed layouts.
_MAX_M_CS = 48
_CS_VMEM_PER_BUF = 2 * 1024 * 1024  # bytes; in + out + gather window +
# the factor's column values all scale with (rows, LB), and the fused
# gather kernel holds ~4 such footprints at once in ~16 MB VMEM


def _cs_lanes(rows, dtype=jnp.float32):
    """Lanes per cs grid step: widest power-of-two multiple of 128 whose
    (rows, LB) block fits the per-buffer VMEM budget, capped at 1024."""
    itemsize = jnp.dtype(dtype).itemsize
    lb = 1024
    while lb > 128 and rows * lb * itemsize > _CS_VMEM_PER_BUF:
        lb //= 2
    return lb


def _cs_layout(m: int) -> bool:
    """Whether the packed kernels should use the cs layout for this m.

    Measured on v5e at N = 32768 (scan-dispatch microbench,
    ``benchmarks/bench_kernels.py``):

    - m = 20: cs loses everywhere (draw/update 731 us vs 378 us tiled;
      fp 272 vs 135). The register-pressure win is real (no spills), but
      every column op spans ``ceil((m-j)/8)`` sublane tiles with ~60%
      padding waste plus shift ops for the misaligned slices/broadcasts —
      more issued work than the tiled layout's VMEM spill traffic.
    - m = 41 (above the tiled kernels' m <= 24 budget, where the
      alternative is the 1-D (512,) layout + an XLA-gather round trip):
      cs WINS the fused gather (2137 us vs 2985) and the log-base-measure
      (397 vs 649) and ties draw/update (1784 vs 1811) and fp (416 vs
      441).

    Hence the default: cs above the tiled budget, tiled below.
    ``BIPK_PALLAS_LAYOUT=tiled|cs`` forces one layout for A/B runs.
    """
    forced = os.environ.get("BIPK_PALLAS_LAYOUT")
    if forced == "cs":
        return True
    if forced == "tiled":
        return False
    return m > _MAX_M


def _cs_pack_prior(p0, p1, p2, m, n, rows, dtype):
    """Pack the (small, unbatched) prior into one (rows, 1) column in the
    packed-statistics row order. T1/T2 keep their raw LOWER entries (the
    kernels only ever read the lower triangle, matching the tiled path's
    ``p1_ref[i, j]`` reads); the T3 slot is zero (df offsets ride the
    static ``p3`` kwarg)."""
    li, _ = _np_tri_cm(m)
    li2, _ = _np_tri_cm(n)
    parts = [
        jnp.asarray(p0, dtype).reshape(m * n),
        jnp.asarray(p1, dtype).reshape(m * m)[li],
        jnp.asarray(p2, dtype).reshape(n * n)[li2],
        jnp.zeros((1,), dtype),
    ]
    return jnp.concatenate(parts)[:, None]


def _np_tri_cm(m):
    """Column-major lower-triangle flat indices (lower, upper)."""
    import numpy as np

    j, i = np.triu_indices(m)
    return i * m + j, j * m + i


def _cs_tri_cols(block, o, m):
    """Contiguous column slices of a column-major packed lower triangle
    living at row offset ``o`` of a (rows, LB) block value."""
    cols, off = [], o
    for j in range(m):
        cols.append(block[off : off + (m - j)])
        off += m - j
    return cols


def _cs_core(S, Ppk, phi, *, m, n, jitter, lam):
    """Factorize + project on a (rows, LB) packed block value.

    ``S`` the packed statistics block, ``Ppk`` the (rows, 1) packed prior
    (or None), ``phi (m, LB)`` or None. Mirrors
    :func:`_factorize_project_core`'s math (same accumulation order, so
    per-particle results match the tiled kernels to rounding): factors
    ``A = P1 + lam*sym(T1) (+jitter)``, forward-substitutes
    ``white = L^{-1}(P0 + lam*T0)`` and ``v = L^{-1} phi``.

    Returns ``(L, white, v, psi, mean, col, half_ld_t1, logdet_psi)``:
    ``L`` the list of Cholesky columns ((m-j, LB), diagonal first),
    ``white (m, n?)`` a list per output dim, ``psi`` an n x n list of
    (1, LB) values, ``mean``/``col`` None when ``phi`` is None.
    """
    assert n <= 2, "cs kernels support n <= 2"
    o1 = m * n
    o2 = o1 + m * (m + 1) // 2

    t1c = _cs_tri_cols(S, o1, m)
    if Ppk is not None:
        p1c = _cs_tri_cols(Ppk, o1, m)
        acols = [
            (t1c[j] * lam if lam != 1.0 else t1c[j]) + p1c[j]
            for j in range(m)
        ]
    else:
        acols = [t1c[j] * lam if lam != 1.0 else t1c[j] for j in range(m)]

    if jitter:
        trace = acols[0][0:1]
        for j in range(1, m):
            trace = trace + acols[j][0:1]
        bump = (jitter / m) * trace
        acols = [
            jnp.concatenate([a[0:1] + bump, a[1:]], axis=0)
            if a.shape[0] > 1
            else a + bump
            for a in acols
        ]

    # left-looking column Cholesky: column j gets one tail-FMA per
    # previous column k (the scalar L[j,k] is a (1, LB) sublane slice)
    L = []
    for j in range(m):
        acc = acols[j]
        for k in range(j):
            lk = L[k]
            acc = acc - lk[j - k :] * lk[j - k : j - k + 1]
        inv = jax.lax.rsqrt(acc[0:1])
        L.append(acc * inv)

    half_ld_t1 = jnp.log(L[0][0:1])
    for j in range(1, m):
        half_ld_t1 = half_ld_t1 + jnp.log(L[j][0:1])

    def fsub(b):
        """Column-sweep solve ``L x = b`` for ``b (m, LB)``; entry i is
        accumulated k-ascending then divided by L[i,i], matching the
        tiled kernels' order."""
        outs = []
        x = b
        for k in range(m):
            xk = x[0:1] / L[k][0:1]
            outs.append(xk)
            if k + 1 < m:
                x = x[1:] - L[k][1:] * xk
        return jnp.concatenate(outs, axis=0)

    # rhs columns of T0 (+prior): rows are interleaved i*n + c (for the
    # n = 2 case the column is assembled from (1, LB) slices — strided
    # sublane reads are not relied on)
    def t0_col(arr, c):
        if n == 1:
            return arr[0:o1]
        return jnp.concatenate(
            [arr[i * n + c : i * n + c + 1] for i in range(m)], axis=0
        )

    white = []
    for c in range(n):
        b = t0_col(S, c)
        if lam != 1.0:
            b = b * lam
        if Ppk is not None:
            b = b + t0_col(Ppk, c)
        white.append(fsub(b))
    v = fsub(phi) if phi is not None else None

    def read_t2(a, b):
        hi, lo = (a, b) if a >= b else (b, a)
        r = o2 + lo * n - (lo * (lo - 1)) // 2 + hi - lo
        x = S[r : r + 1]
        if lam != 1.0:
            x = x * lam
        if Ppk is not None:
            x = x + Ppk[r : r + 1]
        return x

    psi = [[None] * n for _ in range(n)]
    for a in range(n):
        for b in range(n):
            psi[a][b] = read_t2(a, b) - jnp.sum(
                white[a] * white[b], axis=0, keepdims=True
            )
    if n == 1:
        logdet_psi = jnp.log(psi[0][0])
    else:
        off = 0.5 * (psi[0][1] + psi[1][0])
        logdet_psi = jnp.log(psi[0][0] * psi[1][1] - off * off)

    if phi is None:
        return L, white, None, psi, None, None, half_ld_t1, logdet_psi

    mean = [
        jnp.sum(white[c] * v, axis=0, keepdims=True) for c in range(n)
    ]
    col = jnp.sum(v * v, axis=0, keepdims=True) + 1.0
    return L, white, v, psi, mean, col, half_ld_t1, logdet_psi


def _cs_draw(psi, mean, col, df_pred, u, v_unif, n):
    """Matrix-t predictive draw on (1, LB)/(n, LB) values — the polar
    Student-t + predictive scaling of ``_draw_update_packed_kernel``."""
    two_pi = 6.283185307179586
    t = []
    for c in range(n):
        uu = 1.0 - u[c : c + 1]
        r = jnp.sqrt(
            df_pred * (jnp.exp(-(2.0 / df_pred) * jnp.log(uu)) - 1.0)
        )
        t.append(r * jnp.cos(two_pi * v_unif[c : c + 1]))
    inv_df = 1.0 / df_pred
    if n == 1:
        scaled = [jnp.sqrt(psi[0][0] * inv_df) * t[0]]
    else:
        r00 = psi[0][0] * inv_df
        off = 0.5 * (psi[0][1] + psi[1][0]) * inv_df
        r11 = psi[1][1] * inv_df
        l00 = jnp.sqrt(r00)
        l10 = off / l00
        l11 = jnp.sqrt(r11 - l10 * l10)
        scaled = [l00 * t[0], l10 * t[0] + l11 * t[1]]
    sqrt_col = jnp.sqrt(col)
    return [mean[c] + scaled[c] * sqrt_col for c in range(n)]


def _cs_updated_stats(S, phi, y, *, m, n, lam):
    """``lam*S + suff(y, phi)`` assembled as one (rows, LB) value (the
    rank-1 outer products exist only as column slices in registers)."""
    o1 = m * n
    pieces = []
    if n == 1:
        pieces.append(S[0:o1] * lam + phi * y[0])
    else:
        for i in range(m):
            for c in range(n):
                pieces.append(
                    S[i * n + c : i * n + c + 1] * lam
                    + phi[i : i + 1] * y[c]
                )
    off = o1
    for j in range(m):
        pieces.append(
            S[off : off + m - j] * lam + phi[j:] * phi[j : j + 1]
        )
        off += m - j
    for b in range(n):
        for a in range(b, n):
            pieces.append(S[off : off + 1] * lam + y[a] * y[b])
            off += 1
    pieces.append(S[off : off + 1] * lam + 1.0)
    return jnp.concatenate(pieces, axis=0)


def _cs_fp_kernel(
    s_ref, ppk_ref, phi_ref, mean_ref, col_ref, row_ref, ld_ref,
    *, m, n, jitter, lam, has_prior,
):
    """cs-layout :func:`_packed_fp_kernel`: blocks are (rows, LB)."""
    Ppk = ppk_ref[:] if has_prior else None
    _, _, _, psi, mean, col, half_ld, logdet_psi = _cs_core(
        s_ref[:], Ppk, phi_ref[:], m=m, n=n, jitter=jitter, lam=lam
    )
    for a in range(n):
        for b in range(n):
            row_ref[a * n + b : a * n + b + 1] = psi[a][b]
    for c in range(n):
        mean_ref[c : c + 1] = mean[c]
    col_ref[0:1] = col
    ld_ref[0:1] = 2.0 * half_ld
    ld_ref[1:2] = logdet_psi


def _cs_lbm_kernel(
    s_ref, ppk_ref, out_ref, *, m, n, jitter, has_prior
):
    """cs-layout :func:`_packed_lbm_kernel`."""
    Ppk = ppk_ref[:] if has_prior else None
    _, _, _, _, _, _, half_ld, logdet_psi = _cs_core(
        s_ref[:], Ppk, None, m=m, n=n, jitter=jitter, lam=1.0
    )
    out_ref[0:1] = 2.0 * half_ld
    out_ref[1:2] = logdet_psi


def _cs_du_kernel(
    s_ref, ppk_ref, phi_ref, u_ref, v_ref, snew_ref, y_ref, ld_ref,
    *, m, n, jitter, lam, p3, has_prior,
):
    """cs-layout :func:`_draw_update_packed_kernel`."""
    S = s_ref[:]
    phi = phi_ref[:]
    Ppk = ppk_ref[:] if has_prior else None
    _, _, _, psi, mean, col, half_ld, logdet_psi = _cs_core(
        S, Ppk, phi, m=m, n=n, jitter=jitter, lam=lam
    )
    o3 = m * n + m * (m + 1) // 2 + n * (n + 1) // 2
    df_pred = S[o3 : o3 + 1] * lam + p3 + (1.0 - n)
    y = _cs_draw(psi, mean, col, df_pred, u_ref[:], v_ref[:], n)
    snew_ref[:] = _cs_updated_stats(S, phi, y, m=m, n=n, lam=lam)
    for c in range(n):
        y_ref[c : c + 1] = y[c]
    ld_ref[0:1] = 2.0 * half_ld
    ld_ref[1:2] = logdet_psi


def _cs_gathered_block(s_win_ref, anc_ref, ws, rows, lb):
    """Gather the ancestors' packed columns out of a lane-window into one
    (rows, LB) value — the cs counterpart of
    :func:`_windowed_gather_to_scratch` (same non-decreasing-ancestors
    window logic, per 128-lane output tile)."""
    tiles = []
    for tau in range(lb // 128):
        a_lo = anc_ref[0, tau * 128]
        a_hi = anc_ref[0, tau * 128 + 127]
        t_lo = jax.lax.shift_right_logical(a_lo, jnp.int32(7))
        t_hi = jax.lax.shift_right_logical(a_hi, jnp.int32(7))
        rel = jnp.broadcast_to(
            anc_ref[0, tau * 128 : (tau + 1) * 128].reshape(1, 128) - ws,
            (rows, 128),
        )

        win_lanes = s_win_ref.shape[1]

        def round_body(k, acc, _t_lo=t_lo, _rel=rel):
            off = pl.multiple_of(
                jnp.minimum(
                    ((_t_lo - ws // 128) + k) * 128, win_lanes - 128
                ),
                128,
            )
            src = s_win_ref[:, pl.ds(off, 128)]
            idx = _rel - off
            take = jnp.take_along_axis(src, jnp.clip(idx, 0, 127), axis=1)
            return jnp.where((idx >= 0) & (idx < 128), take, acc)

        # static common-case rounds (masked no-ops beyond the span; any
        # in-window read of a valid idx returns the true ancestor column,
        # so extra rounds are idempotent); dynamic tail is usually 0-trip
        out0 = jnp.zeros((rows, 128), s_win_ref.dtype)
        for k in range(_GATHER_STATIC_ROUNDS):
            out0 = round_body(k, out0)
        tiles.append(
            jax.lax.fori_loop(
                _GATHER_STATIC_ROUNDS, t_hi - t_lo + 1, round_body, out0
            )
        )
    return jnp.concatenate(tiles, axis=1) if len(tiles) > 1 else tiles[0]


def _cs_du_gather_kernel(
    w_ref, s_win_ref, anc_ref, ppk_ref, phi_ref, u_ref, v_ref,
    snew_ref, y_ref, ld_ref,
    *, m, n, jitter, lam, p3, has_prior, rows, lb,
):
    """cs-layout :func:`_draw_update_gather_kernel`: the resampling gather
    lands directly in a register/VMEM VALUE feeding the factorization."""
    ws = w_ref[pl.program_id(0)] * 128
    S = _cs_gathered_block(s_win_ref, anc_ref, ws, rows, lb)
    phi = phi_ref[:]
    Ppk = ppk_ref[:] if has_prior else None
    _, _, _, psi, mean, col, half_ld, logdet_psi = _cs_core(
        S, Ppk, phi, m=m, n=n, jitter=jitter, lam=lam
    )
    o3 = m * n + m * (m + 1) // 2 + n * (n + 1) // 2
    df_pred = S[o3 : o3 + 1] * lam + p3 + (1.0 - n)
    y = _cs_draw(psi, mean, col, df_pred, u_ref[:], v_ref[:], n)
    snew_ref[:] = _cs_updated_stats(S, phi, y, m=m, n=n, lam=lam)
    for c in range(n):
        y_ref[c : c + 1] = y[c]
    ld_ref[0:1] = 2.0 * half_ld
    ld_ref[1:2] = logdet_psi


def _cs_spec(lead_rows, lb):
    return pl.BlockSpec(
        (lead_rows, lb), lambda i: (0, i), memory_space=pltpu.VMEM
    )


def _cs_prior_spec(rows):
    return pl.BlockSpec(
        (rows, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )


def _cs_call(kernel, S, ppk, extras, out_rows, *, rows, lb, N):
    """Shared pallas_call plumbing for the cs packed kernels.

    ``extras`` = [(array (k, N), k), ...] extra lane-sharded inputs;
    ``out_rows`` = [r0, r1, ...] row counts of the (r, N) outputs.
    """
    total = -(-N // lb) * lb
    grid = (total // lb,)
    outs = _pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _cs_spec(rows, lb),
            _cs_prior_spec(rows),
            *[_cs_spec(k, lb) for _, k in extras],
        ],
        out_specs=[_cs_spec(r, lb) for r in out_rows],
        out_shape=[
            jax.ShapeDtypeStruct((r, total), S.dtype) for r in out_rows
        ],
    )(
        _pad_last(S, total),
        ppk,
        *[_pad_last(a, total) for a, _ in extras],
    )
    return [o[:, :N] for o in outs]


def _cs_du_gather_call(
    S, ancestors, w, phi, u, v, jitter, lam, prior, p3, m, n,
    *, rows, block, wt, total_in,
):
    """cs-layout launch of the fused gather + draw/update kernel (see
    :func:`draw_update_gather_packed_blocks` for the contract; ``block``
    and ``wt`` come from :func:`gather_plan`, shared with the mniw
    dispatch that computed ``w``)."""
    n_in = S.shape[-1]
    N = ancestors.shape[-1]
    total = -(-N // block) * block
    grid = (total // block,)
    win = wt * _LANES

    has_prior = prior is not None
    if has_prior:
        ppk = _cs_pack_prior(*prior, m, n, rows, S.dtype)
    else:
        ppk = jnp.zeros((rows, 1), S.dtype)

    anc = ancestors.astype(jnp.int32)
    if total != N:
        anc = jnp.pad(anc, (0, total - N), constant_values=n_in - 1)
    S_pad = _pad_last(S, total_in)

    if win == total_in:
        s_spec = pl.BlockSpec(
            (rows, total_in), lambda i, w_ref: (0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        from jax._src.pallas import core as pallas_core

        s_spec = pl.BlockSpec(
            (pallas_core.Element(rows), pallas_core.Element(win)),
            lambda i, w_ref: (0, pl.multiple_of(w_ref[i] * _LANES, _LANES)),
            memory_space=pltpu.VMEM,
        )

    def lspec(k):
        return pl.BlockSpec(
            (k, block), lambda i, w_ref: (0, i), memory_space=pltpu.VMEM
        )

    # (1, total) layout: a 1-D s32 operand's XLA tiling (T(1024)) clashes
    # with sub-1024 Mosaic blocks; the 2-D (1, block) form is always legal
    anc_spec = pl.BlockSpec(
        (1, block), lambda i, w_ref: (0, i), memory_space=pltpu.VMEM
    )
    ppk_spec = pl.BlockSpec(
        (rows, 1), lambda i, w_ref: (0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[s_spec, anc_spec, ppk_spec, lspec(m), lspec(n), lspec(n)],
        out_specs=[lspec(rows), lspec(n), lspec(2)],
    )

    snew, y, ld = _pallas_call(
        functools.partial(
            _cs_du_gather_kernel, m=m, n=n, jitter=jitter, lam=lam,
            p3=p3, has_prior=has_prior, rows=rows, lb=block,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, total), S.dtype),
            jax.ShapeDtypeStruct((n, total), S.dtype),
            jax.ShapeDtypeStruct((2, total), S.dtype),
        ],
    )(
        w,
        S_pad,
        anc[None, :],
        ppk,
        _pad_last(phi, total),
        _pad_last(u, total),
        _pad_last(v, total),
    )
    return snew[:, :N], y[:, :N], ld[0, :N], ld[1, :N]


# ---------------------------------------------------------------------------
# Fused systematic resampling (SURVEY build order #8).
#
# Semantics: ``resampling.systematic`` — the closed-form-offspring
# formulation of ``systematic_SISR`` (/root/reference/src/Filtering.py:6-37).
# The XLA path costs ~305 us/call at N = 32768 on v5e (measured, scan
# marginal): the scatter-add serializes and the cumulative sums are
# multi-kernel. Two Pallas calls replace it, everything VMEM-resident:
#
#   1. ``_systematic_cdf_kernel``: normalize + cumulative weight sum via
#      MXU matmuls against triangular 0/1 masks (lane-prefix
#      (R,128)@(128,128), then row offsets (R,R)@(R,1)), then cumulative
#      offspring counts ``cc_i = clip(ceil(n*cdf_i - u), 0, n)``.
#   2. ``_systematic_merge_kernel``: counts -> sorted ancestors WITHOUT a
#      scatter or a searchsorted. ``anc[k] = #{i : cc_i <= k}``, and
#      because the output grid is arithmetic, a source value's position
#      against output block o is closed-form: ``p = clip(cc - 128*o, 0,
#      128)``, so the per-(source row, output block) count is one MXU
#      vector transpose + one (128,128) broadcast compare + one MXU
#      ones-contraction. A two-pointer merge over (row, block) pairs
#      runs in a STATIC 2R-trip fori (dynamic-trip loops cost ~0.65 us
#      per round in Mosaic — measured), with the tile-end values read as
#      scalars from the prefetched SMEM operand.
# ---------------------------------------------------------------------------

# VMEM budget for the whole-population resampling kernel: weights + cc +
# ancestors, each (R, 128) = N * 4 B, plus the (R, R) offset mask.
_RESAMPLE_MAX_N = 131072
_BLOCK8 = 8 * _LANES
# speculative merge-walk steps per fori trip (see _systematic_merge_kernel).
# The kernel loads two 8-row blocks per trip, so the speculative rows
# r_c .. r_c+K must stay within those 16 rows minus the base row's own
# worst-case advance — values past 8 silently select zero rows and emit
# wrong ancestors; fail loudly on a mistyped env var instead.
_MERGE_SPEC = int(os.environ.get("BIPK_MERGE_SPEC", "3"))
if not 1 <= _MERGE_SPEC <= 8:
    raise ValueError(
        f"BIPK_MERGE_SPEC={_MERGE_SPEC} out of range [1, 8]: the merge "
        "kernel's speculative rows must fall inside its two loaded 8-row "
        "blocks"
    )


def supported_resample(n: int) -> bool:
    """Whether the fused resampling kernel handles this population size
    (whole population + (R, R) prefix mask must sit in VMEM)."""
    return 256 <= n <= _RESAMPLE_MAX_N


def _systematic_cdf_kernel(w_ref, u_ref, cc_ref, *, n, rows):
    """Stage 1: weights -> cumulative offspring counts (int32)."""
    f32 = jnp.float32
    lanes = _LANES
    w = jnp.maximum(w_ref[...], 0.0)
    total = jnp.sum(w)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    flat_i = row_i * lanes + lane_i
    uniform = jnp.where(flat_i < n, 1.0 / n, 0.0).astype(f32)
    wn = jnp.where(total > 0, w / total, uniform)

    li = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    tri_incl = (li <= lj).astype(f32)  # [l', l] = 1 iff l' <= l
    c_in_row = jax.lax.dot_general(
        wn, tri_incl, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    rs = c_in_row[:, lanes - 1 : lanes]  # (R, 1) row sums
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    tri_strict = (rj < ri).astype(f32)  # [r, r'] = 1 iff r' < r
    off = jax.lax.dot_general(
        tri_strict, rs, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cdf = c_in_row + off

    u = u_ref[0, 0]
    cc = jnp.clip(jnp.ceil(n * cdf - u), 0.0, float(n))
    cc_ref[...] = cc.astype(jnp.int32)


def _systematic_merge_kernel(te_ref, cc_ref, anc_ref, *, n, rows):
    """Stage 2: sorted cumulative counts -> sorted ancestors.

    ``te_ref (rows,)`` prefetched SMEM tile-end values with the LAST
    entry forced to ``rows*128`` (so the row pointer never runs off the
    end); ``cc_ref (rows, 128)`` int32 cumulative counts.

    The two-pointer (source row, output row) merge walk advances
    ``_MERGE_SPEC`` path steps per fori trip: all pair counts on the
    K-step diamond ``{(r+i, o+j) : i+j < K}`` are speculatively computed
    up front as INDEPENDENT op chains (one MXU transpose per candidate
    source row, one compare + one MXU contraction per pair), then K
    scalar-select micro-steps consume them. The walk itself is serial,
    so trips — not ops — bound the wall clock (measured ~280 cycles per
    trip at K = 1); K = 3 cuts trips from 2R to ceil(2R/3).
    """
    lanes = _LANES
    K = _MERGE_SPEC
    iota_lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)
    eye_i = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    eye_j = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    eye_f = (eye_i == eye_j).astype(jnp.float32)
    ones_row = (eye_i >= 0).astype(jnp.float32)[:1]  # (1, 128) of ones
    iota_f = iota_lane.astype(jnp.float32)

    def trip(_, carry):
        r, o, r0, acc, buf = carry
        r_c = jnp.minimum(r, rows - 1)
        base = (r_c // 8) * 8
        base2 = jnp.minimum(base + 8, rows - 8)
        blk0 = cc_ref[pl.ds(pl.multiple_of(base, 8), 8), :]
        blk1 = cc_ref[pl.ds(pl.multiple_of(base2, 8), 8), :]

        # speculative pair counts: cnt[i][j] = #{l : cc[r+i, l] <= 128*(o+j)+127-ish}
        # via closed-form positions p = clip(cc[r+i] - 128*(o+j), 0, 128)
        cnts = [[None] * K for _ in range(K)]
        for i in range(K):
            ri = jnp.minimum(r_c + i, rows - 1)
            off0 = ri - base
            off1 = ri - base2
            v_row = jnp.sum(
                jnp.where((sub_i == off0) & (off0 < 8), blk0, 0)
                + jnp.where((sub_i == off1) & (off0 >= 8), blk1, 0),
                axis=0, keepdims=True,
            )  # (1, 128)
            v_col = jax.lax.dot_general(
                eye_f, v_row.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (128, 1)
            for j in range(K - i):
                p_col = jnp.clip(
                    v_col - ((o + j) * lanes).astype(jnp.float32),
                    0.0, float(lanes),
                )
                mms = (p_col <= iota_f).astype(jnp.float32)
                cnt = jax.lax.dot_general(
                    ones_row, mms, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (1, 128)
                cnts[i][j] = cnt.astype(jnp.int32)

        # K serial micro-steps over the precomputed diamond
        di = jnp.int32(0)
        dj = jnp.int32(0)
        for micro in range(K):
            o_m = o + dj
            active = o_m < rows
            cnt_cur = jnp.zeros((1, lanes), jnp.int32)
            for i in range(micro + 1):
                j = micro - i
                if cnts[i][j] is not None:
                    cnt_cur = jnp.where(di == i, cnts[i][j], cnt_cur)
            te_r = te_ref[jnp.minimum(r + di, rows - 1)]
            block_end = o_m * lanes + lanes - 1
            adv_blk = te_r > block_end
            do_write = adv_blk & active

            acc = acc + jnp.where(active, cnt_cur, 0)
            anc_row = jnp.clip(acc + r0 * lanes, 0, n - 1)
            buf = jnp.where(
                do_write & (sub_i == o_m % 8),
                jnp.broadcast_to(anc_row, (8, lanes)), buf,
            )

            @pl.when(do_write & (o_m % 8 == 7))
            def _flush(buf=buf, o_m=o_m):
                anc_ref[
                    pl.ds(pl.multiple_of((o_m // 8) * 8, 8), 8), :
                ] = buf

            step_blk = adv_blk | ~active
            r0 = jnp.where(do_write, r + di, r0)
            acc = jnp.where(do_write, 0, acc)
            di = jnp.where(step_blk, di, di + 1)
            dj = jnp.where(step_blk, dj + 1, dj)

        return r + di, o + dj, r0, acc, buf

    z = jnp.zeros((8, lanes), jnp.int32)
    jax.lax.fori_loop(
        0, -(-2 * rows // K),
        trip,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), z[:1], z),
    )


@functools.partial(jax.jit, static_argnames=("n",))
def systematic_ancestors_blocks(w, u, n: int):
    """Sorted systematic-resampling ancestors, fused in two Pallas calls.

    ``w (n,)`` unnormalized non-log weights, ``u`` scalar uniform in
    [0, 1); returns ``(n,)`` sorted int32 ancestors. Parity with the XLA
    ``resampling.systematic`` except where the matmul-prefix CDF rounds
    differently at exact grid/CDF ties (offspring shift by at most one
    output slot)."""
    assert supported_resample(n), n
    # pad to a whole number of (8, 128) tiles: every dynamic sublane
    # slice and output write in the kernels is then tile-aligned
    total = -(-n // _BLOCK8) * _BLOCK8
    rows = total // _LANES
    w_pad = jnp.pad(w.astype(jnp.float32), (0, total - n))
    w2 = w_pad.reshape(rows, _LANES)
    u2 = jnp.asarray(u, jnp.float32).reshape(1, 1)

    cc = _pallas_call(
        functools.partial(_systematic_cdf_kernel, n=n, rows=rows),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
    )(w2, u2)

    # tile ends as the merge kernel's scalar operand; the last entry is
    # forced past the final block so the row pointer never outruns the
    # block pointer
    te = jnp.where(
        jnp.arange(rows) == rows - 1, total, cc[:, _LANES - 1]
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((rows, _LANES), lambda i, te_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i, te_ref: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    anc = _pallas_call(
        functools.partial(_systematic_merge_kernel, n=n, rows=rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
    )(te, cc)
    return anc.reshape(total)[:n]
