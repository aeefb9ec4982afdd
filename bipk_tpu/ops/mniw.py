"""Matrix-normal-inverse-Wishart (MNIW) conjugate algebra.

Natural-parameter bookkeeping for a matrix-variate Gaussian likelihood
``y = A phi + e``, ``e ~ N(0, S)`` with conjugate prior
``A | S ~ MN(M, S, V)``, ``S ~ IW(Psi, nu)``.

The four natural parameters / sufficient statistics are carried as a
:class:`MNIW` pytree so priors and data statistics add elementwise:

========  ===========  ==========================================
field     shape        standard-parameter meaning
========  ===========  ==========================================
``T0``    ``(m, n)``   ``V^{-1} M^T``                (data: ``phi y^T``)
``T1``    ``(m, m)``   ``V^{-1}``                    (data: ``phi phi^T``)
``T2``    ``(n, n)``   ``M V^{-1} M^T + Psi``        (data: ``y y^T``)
``T3``    ``()``       ``nu``                        (data: ``1``)
========  ===========  ==========================================

Semantics match the reference implementation
(``/root/reference/src/BayesianInferrence.py:18-124``) but the layout is
batch-first and the hot path exposes a fused Cholesky factorization
(:func:`factorize`) that is shared between the posterior-mean evaluation and
the matrix-t predictive — the reference re-factorizes ``prior + stats`` for
each of those uses.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy as jsp

from bipk_tpu.ops import batched_linalg as bla


class MNIW(NamedTuple):
    """Natural parameters (or additive sufficient statistics) of an MNIW."""

    T0: jax.Array  # (m, n)
    T1: jax.Array  # (m, m)
    T2: jax.Array  # (n, n)
    T3: jax.Array  # ()

    def __add__(self, other: "MNIW") -> "MNIW":  # type: ignore[override]
        return MNIW(
            self.T0 + other.T0,
            self.T1 + other.T1,
            self.T2 + other.T2,
            self.T3 + other.T3,
        )

    def scale(self, factor) -> "MNIW":
        """Exponential forgetting: multiply every statistic by ``factor``."""
        return MNIW(
            self.T0 * factor,
            self.T1 * factor,
            self.T2 * factor,
            self.T3 * factor,
        )


class MNIWFactor(NamedTuple):
    """Cholesky factorization of ``T1`` with derived quantities.

    ``chol`` is lower-triangular with ``chol @ chol.T = sym(T1)``;
    ``white_T0 = chol^{-1} T0`` so the posterior mean of ``A`` is
    ``white_T0^T @ chol^{-1}`` and the predictive needs only triangular
    solves against ``chol``.
    """

    chol: jax.Array  # (m, m) lower
    white_T0: jax.Array  # (m, n)
    row_scale: jax.Array  # (n, n) = T2 - white_T0^T white_T0
    df: jax.Array  # ()


class Predictive(NamedTuple):
    """Matrix-t predictive distribution at a single basis vector."""

    mean: jax.Array  # (n,)
    col_scale: jax.Array  # () scalar phi^T V_post phi + 1
    row_scale: jax.Array  # (n, n)
    df: jax.Array  # ()


def _default_jitter(dtype) -> float:
    return 0.0 if jnp.dtype(dtype) == jnp.float64 else 1e-9


def chol_spd(A: jax.Array, jitter: float | None = None) -> jax.Array:
    """Cholesky of an SPD matrix with dtype-dependent relative jitter."""
    if jitter is None:
        jitter = _default_jitter(A.dtype)
    if jitter:
        scale = jnp.trace(A) / A.shape[-1]
        A = A + (jitter * scale) * jnp.eye(A.shape[-1], dtype=A.dtype)
    return bla.chol_lower(A)


def solve_spd(A: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``A X = B`` for SPD ``A`` via Cholesky.

    Mirrors ``/root/reference/src/BayesianInferrence.py:11-13``.
    """
    L = chol_spd(A)
    return bla.cho_solve(L, B)


def natural_from_standard(
    mean, col_cov, row_scale, df
) -> MNIW:
    """Standard MNIW parameters -> natural parameters.

    Parity with ``prior_mniw_2naturalPara``
    (``/root/reference/src/BayesianInferrence.py:18-32``).
    """
    mean = jnp.atleast_2d(jnp.asarray(mean))
    col_cov = jnp.asarray(col_cov)
    row_scale = jnp.atleast_2d(jnp.asarray(row_scale))

    T0 = solve_spd(col_cov, mean.T)  # V^{-1} M^T
    T1 = solve_spd(col_cov, jnp.eye(col_cov.shape[0], dtype=col_cov.dtype))
    T2 = mean @ T0 + row_scale
    T3 = jnp.asarray(df, dtype=mean.dtype)
    return MNIW(T0, T1, T2, T3)


def standard_from_natural(nat: MNIW):
    """Natural parameters -> standard parameters ``(mean, col_cov, row_scale, df)``.

    Parity with ``prior_mniw_2naturalPara_inv``
    (``/root/reference/src/BayesianInferrence.py:35-45``).
    """
    L = chol_spd(nat.T1)
    eye = jnp.eye(nat.T1.shape[0], dtype=nat.T1.dtype)
    col_cov = bla.cho_solve(L, eye)
    mean = bla.cho_solve(L, nat.T0).T
    row_scale = nat.T2 - mean @ nat.T0
    return jnp.atleast_2d(mean), col_cov, jnp.atleast_2d(row_scale), nat.T3


def posterior_mean(nat: MNIW) -> jax.Array:
    """Posterior mean coefficient matrix ``E[A] = (sym(T1)^{-1} T0)^T``.

    Parity with ``prior_mniw_mean``
    (``/root/reference/src/BayesianInferrence.py:48-50``).
    """
    T1_sym = 0.5 * (nat.T1 + nat.T1.T)
    return solve_spd(T1_sym, nat.T0).T


def suff_stat(y: jax.Array, phi: jax.Array) -> MNIW:
    """Rank-1 sufficient statistics of one datum ``(y, phi)``.

    Parity with ``prior_mniw_calcStatistics``
    (``/root/reference/src/BayesianInferrence.py:53-61``).
    """
    y = jnp.atleast_1d(y)
    return MNIW(
        jnp.outer(phi, y),
        jnp.outer(phi, phi),
        jnp.outer(y, y),
        jnp.asarray(1.0, dtype=phi.dtype),
    )


def factorize(nat: MNIW) -> MNIWFactor:
    """Factor ``sym(T1)`` once; everything downstream is triangular solves.

    This fuses the two separate SPD factorizations the reference performs per
    filter step (``prior_mniw_mean`` at ``Algorithm1.py:212`` and
    ``prior_mniw_2naturalPara_inv`` at ``Algorithm1.py:252``) into one.
    """
    T1_sym = 0.5 * (nat.T1 + nat.T1.T)
    L = chol_spd(T1_sym)
    white_T0 = bla.solve_lower(L, nat.T0)
    row_scale = nat.T2 - white_T0.T @ white_T0
    return MNIWFactor(L, white_T0, row_scale, nat.T3)


def factor_mean_at(factor: MNIWFactor, phi: jax.Array) -> jax.Array:
    """Posterior-mean prediction ``E[A] phi`` from a shared factorization."""
    v = bla.solve_lower(factor.chol, phi)
    return factor.white_T0.T @ v


def factor_predictive(factor: MNIWFactor, phi: jax.Array) -> Predictive:
    """Matrix-t predictive at basis vector ``phi`` from a factorization.

    Equivalent to ``prior_mniw_2naturalPara_inv`` followed by
    ``prior_mniw_Predictive`` (``/root/reference/src/BayesianInferrence.py:
    35-45,64-89``) but with a single triangular solve instead of a fresh
    Cholesky:  ``mean = W^T v``, ``col_scale = v^T v + 1`` where
    ``v = chol^{-1} phi`` and ``W = chol^{-1} T0``.
    """
    n = factor.row_scale.shape[-1]
    v = bla.solve_lower(factor.chol, phi)
    mean = factor.white_T0.T @ v
    col_scale = v @ v + jnp.asarray(1.0, dtype=phi.dtype)
    df = factor.df + 1.0 - n
    return Predictive(mean, col_scale, factor.row_scale / df, df)


def predictive(mean, col_cov, row_scale, df, phi) -> Predictive:
    """Matrix-t predictive from standard parameters (single basis vector).

    Parity with ``prior_mniw_Predictive``
    (``/root/reference/src/BayesianInferrence.py:64-89``) for the
    single-point case used throughout the algorithms.
    """
    mean = jnp.atleast_2d(mean)
    row_scale = jnp.atleast_2d(row_scale)
    n = row_scale.shape[0]
    df_pred = df + 1.0 - n
    pred_mean = mean @ phi
    col_scale = phi @ col_cov @ phi + jnp.asarray(1.0, dtype=phi.dtype)
    return Predictive(pred_mean, col_scale, row_scale / df_pred, df_pred)


def sample_predictive(key: jax.Array, pred: Predictive) -> jax.Array:
    """Draw from the matrix-t predictive (single basis vector).

    Parity with ``prior_mniw_drawPred``
    (``/root/reference/src/BayesianInferrence.py:92-108``): the draw is
    ``mean + chol(row_scale) t * sqrt(col_scale)`` with iid Student-t ``t``.
    """
    from bipk_tpu.ops.gaussian import student_t

    chol_row = chol_spd(jnp.atleast_2d(pred.row_scale))
    n = chol_row.shape[0]
    t = student_t(key, pred.df, (n,), chol_row.dtype)
    return pred.mean + (chol_row @ t) * jnp.sqrt(pred.col_scale)


def log_base_measure(nat: MNIW) -> jax.Array:
    """Log base measure / marginal-likelihood normalizer of the MNIW.

    Parity with ``prior_mniw_log_base_measure``
    (``/root/reference/src/BayesianInferrence.py:111-124``) but with
    Cholesky-based log-determinants instead of ``log(det(.))`` for numerical
    range (the reference overflows ``det`` long before ``logdet`` does).
    """
    n = nat.T2.shape[-1]
    m = nat.T1.shape[-1]

    L1 = chol_spd(0.5 * (nat.T1 + nat.T1.T))
    white = bla.solve_lower(L1, nat.T0)
    Psi = nat.T2 - white.T @ white
    logdet_T1 = bla.logdet_from_chol(L1)
    LPsi = chol_spd(0.5 * (Psi + Psi.T))
    logdet_Psi = bla.logdet_from_chol(LPsi)

    nu = nat.T3
    out = -0.5 * n * m * jnp.log(2.0 * jnp.pi)
    out = out + 0.5 * n * logdet_T1
    out = out - 0.5 * nu * n * jnp.log(2.0)
    out = out - jsp.special.multigammaln(nu / 2.0, n)
    out = out + 0.5 * nu * logdet_Psi
    return out


def sample_parameters(key: jax.Array, nat: MNIW):
    """Draw ``(A, S)`` from the MNIW: ``S ~ IW(Psi, nu)``, ``A ~ MN(M, S, V)``.

    The inverse-Wishart draw uses the Bartlett decomposition on the
    precision side, as in ``PGAS.sample_params``
    (``/root/reference/src/PGAS.py:310-341``): with ``R = chol(Psi)`` and a
    Bartlett factor ``T`` (chi-square diagonal, standard-normal strict lower
    triangle), ``C = R^{-T} T`` is a Cholesky factor of ``W ~ Wishart(nu,
    Psi^{-1})`` and ``S = W^{-1}`` has Cholesky factor ``C^{-T}``.
    """
    mean, col_cov, row_scale, df = standard_from_natural(nat)
    n = row_scale.shape[0]
    dtype = row_scale.dtype

    key_bartlett, key_normals, key_coeff = jax.random.split(key, 3)

    chol_psi = chol_spd(row_scale)
    eye = jnp.eye(n, dtype=dtype)
    # L L^T = Psi^{-1}
    L = jsp.linalg.solve_triangular(chol_psi, eye, lower=True)

    dof = df - jnp.arange(n, dtype=dtype)
    diag = jnp.sqrt(jax.random.chisquare(key_bartlett, dof, dtype=dtype))
    lower = jnp.tril(jax.random.normal(key_normals, (n, n), dtype=dtype), k=-1)
    bartlett = lower + jnp.diag(diag)

    C = L @ bartlett
    S_chol = jsp.linalg.solve_triangular(C.T, eye, lower=False)
    S = S_chol @ S_chol.T

    V_chol = chol_spd(col_cov)
    Z = jax.random.normal(key_coeff, mean.shape, dtype=dtype)
    A = mean + S_chol @ Z @ V_chol.T
    return A, S


# ---------------------------------------------------------------------------
# Batch-last MNIW kernels for the filter hot path.
#
# Layout: T0 (m, n, N), T1 (m, m, N), T2 (n, n, N), T3 (N,) with the
# particle batch N in TPU lanes (see bipk_tpu.ops.batched_linalg). The
# output dimension n is 1-2 in every workload, so cross-n contractions are
# unrolled. RNG is drawn in one batched call per step instead of per
# particle.
# ---------------------------------------------------------------------------


def _gram_bl(W: jax.Array) -> jax.Array:
    """``(m, n, N) -> (n, n, N)`` Gram matrix ``W^T W`` over axis 0."""
    n = W.shape[1]
    return jnp.stack(
        [
            jnp.stack([jnp.sum(W[:, i] * W[:, j], axis=0) for j in range(n)])
            for i in range(n)
        ]
    )


def _pallas_ok(
    nat_or_dtype, use_pallas=None, m: int | None = None,
    small_out: bool = False, gather: bool = False,
) -> bool:
    if use_pallas is False:
        return False
    dtype = getattr(nat_or_dtype, "dtype", None) or nat_or_dtype.T1.dtype
    if jnp.dtype(dtype) != jnp.float32:
        return False
    from bipk_tpu.ops import pallas_kernels

    if m is not None:
        if gather:
            ok = pallas_kernels.supported_gather(m)
        else:
            ok = (
                pallas_kernels.supported_small_out(m)
                if small_out
                else pallas_kernels.supported(m)
            )
        if not ok:
            return False
    return pallas_kernels.enabled()


def factorize_bl(
    nat: MNIW, jitter: float | None = None, use_pallas: bool | None = None
) -> MNIWFactor:
    """Batch-last :func:`factorize`: leaves shaped ``(m, m, N)`` etc.

    Dispatches to the fused Pallas kernel on TPU (one kernel for the whole
    symmetrize + jitter + Cholesky + whitening + Schur complement chain);
    the unrolled-XLA formulation is the portable fallback. ``use_pallas=
    False`` forces the XLA path (needed under GSPMD auto-partitioning,
    where ``pallas_call`` cannot be partitioned).
    """
    if jitter is None:
        jitter = _default_jitter(nat.T1.dtype)
    if _pallas_ok(nat, use_pallas, m=nat.T1.shape[0]):
        from bipk_tpu.ops import pallas_kernels

        chol, white, row = pallas_kernels.factorize_blocks(
            nat.T0, nat.T1, nat.T2, float(jitter)
        )
        return MNIWFactor(chol, white, row, nat.T3)
    T1s = 0.5 * (nat.T1 + jnp.swapaxes(nat.T1, 0, 1))
    if jitter:
        m = T1s.shape[0]
        trace = sum(T1s[i, i] for i in range(m)) / m  # (N,)
        eye = jnp.eye(m, dtype=T1s.dtype)[:, :, None]
        T1s = T1s + (jitter * trace) * eye
    L = bla.chol_lower_bl(T1s)
    white_T0 = bla.solve_lower_bl(L, nat.T0)
    row_scale = nat.T2 - _gram_bl(white_T0)
    return MNIWFactor(L, white_T0, row_scale, nat.T3)


def factorize_scaled_bl(
    stats: MNIW,
    prior: MNIW | None = None,
    lam: float = 1.0,
    jitter: float | None = None,
    use_pallas: bool | None = None,
) -> MNIWFactor:
    """Factor ``prior + lam * stats`` (batch-last) in one fused pass.

    Folds the exponential-forgetting scale (``lam``, the reference's
    ``forgetting_factor * stats`` pass at
    ``/root/reference/src/Algorithm1.py:315-318``) and the prior addition
    into the factorization kernel, so neither ``lam * stats`` nor
    ``prior + stats`` is ever materialized in HBM. ``prior`` is an
    *unbatched* MNIW (leaves ``(m, n)``, ``(m, m)``, ``(n, n)``, ``()``).
    """
    if jitter is None:
        jitter = _default_jitter(stats.T1.dtype)
    df = stats.T3 * lam + (prior.T3 if prior is not None else 0.0)
    if _pallas_ok(stats, use_pallas, m=stats.T1.shape[0]):
        from bipk_tpu.ops import pallas_kernels

        prior_blocks = (
            (prior.T0, prior.T1, prior.T2) if prior is not None else None
        )
        chol, white, row = pallas_kernels.factorize_blocks(
            stats.T0, stats.T1, stats.T2, float(jitter), float(lam),
            prior_blocks,
        )
        return MNIWFactor(chol, white, row, df)
    scaled = MNIW(stats.T0 * lam, stats.T1 * lam, stats.T2 * lam, df)
    if prior is not None:
        nat = MNIW(
            scaled.T0 + prior.T0[..., None],
            scaled.T1 + prior.T1[..., None],
            scaled.T2 + prior.T2[..., None],
            df,
        )
    else:
        nat = scaled
    return factorize_bl(nat, jitter=jitter, use_pallas=False)


class ProjectedFactor(NamedTuple):
    """Per-particle matrix-t predictive pieces at one basis vector, plus
    the log-determinants of the underlying MNIW — everything a filter step
    needs downstream of the factorization, WITHOUT the factor itself.

    Produced by :func:`factorize_project_bl`; shapes (batch-last):
    ``mean (n, N)``, ``col_scale (N,)``, ``row_scale (n, n, N)``,
    ``logdet_T1 (N,)``, ``logdet_Psi (N,)``, ``df (N,)``.
    """

    mean: jax.Array
    col_scale: jax.Array
    row_scale: jax.Array
    logdet_T1: jax.Array
    logdet_Psi: jax.Array
    df: jax.Array


def factorize_project_bl(
    stats: MNIW,
    phi: jax.Array,
    prior: MNIW | None = None,
    lam: float = 1.0,
    jitter: float | None = None,
    use_pallas: bool | None = None,
) -> ProjectedFactor:
    """Factor ``prior + lam * stats`` and project at ``phi`` in one pass.

    The fused Pallas kernel keeps the Cholesky factor entirely on-chip and
    emits only the small per-particle outputs (predictive mean/scales and
    log-determinants); the m^2-sized factor never touches HBM. The XLA
    fallback composes :func:`factorize_scaled_bl` with triangular solves —
    identical math.

    ``stats`` may be structured (leaves ``(m, n, N)`` etc.) or flat
    (leaves ``(m*n, N)`` etc., see :func:`to_flat_bl`) — the flat layout
    avoids TPU tile-padding relayouts between the filter-step passes.
    """
    if jitter is None:
        jitter = _default_jitter(stats.T1.dtype)
    df = stats.T3 * lam + (prior.T3 if prior is not None else 0.0)
    flat = stats.T1.ndim == 2
    m = phi.shape[0]
    n = (stats.T0.shape[0] // m) if flat else stats.T2.shape[0]
    if (
        n <= 2
        and phi.ndim == 2
        and _pallas_ok(stats, use_pallas, m=m, small_out=True)
    ):
        from bipk_tpu.ops import pallas_kernels

        prior_blocks = (
            (prior.T0, prior.T1, prior.T2) if prior is not None else None
        )
        mean, col, row, ld1, ldp = pallas_kernels.factorize_project_blocks(
            stats.T0, stats.T1, stats.T2, phi, float(jitter), float(lam),
            prior_blocks, m=m, n=n,
        )
        return ProjectedFactor(mean, col, row, ld1, ldp, df)
    if flat:
        stats = from_flat_bl(stats, m, n)
    f = factorize_scaled_bl(
        stats, prior=prior, lam=lam, jitter=jitter, use_pallas=False
    )
    v = bla.solve_lower_bl(f.chol, phi)
    mean = jnp.stack(
        [jnp.sum(f.white_T0[:, c] * v, axis=0) for c in range(n)]
    )
    col = jnp.sum(v * v, axis=0) + 1.0
    ld1 = bla.logdet_from_chol_bl(f.chol)
    psi = f.row_scale
    if n == 1:
        ldp = jnp.log(psi[0, 0])
    elif n == 2:
        off = 0.5 * (psi[0, 1] + psi[1, 0])
        ldp = jnp.log(psi[0, 0] * psi[1, 1] - off * off)
    else:
        sym = 0.5 * (psi + jnp.swapaxes(psi, 0, 1))
        ldp = bla.logdet_from_chol_bl(bla.chol_lower_bl(sym))
    return ProjectedFactor(mean, col, psi, ld1, ldp, df)


def sample_projected_bl(
    key: jax.Array, fp: ProjectedFactor, dtype
) -> jax.Array:
    """Matrix-t draw from a :class:`ProjectedFactor` (batch-last).

    Identical semantics to :func:`sample_predictive_bl` — the reference's
    ``prior_mniw_drawPred`` (``/root/reference/src/BayesianInferrence.py:
    92-108``) — given the fused factorize+project outputs.
    """
    from bipk_tpu.ops.gaussian import student_t

    n = fp.row_scale.shape[0]
    df_pred = fp.df + (1.0 - n)
    row_pred = fp.row_scale / df_pred
    chol_row = bla.chol_lower_bl(row_pred)
    t = student_t(key, df_pred, (n,) + df_pred.shape, dtype)
    scaled = jnp.stack(
        [
            sum(chol_row[i, j] * t[j] for j in range(n))
            for i in range(n)
        ]
    )
    return fp.mean + scaled * jnp.sqrt(fp.col_scale)


def log_base_measure_from_projected_bl(
    fp: ProjectedFactor, m: int
) -> jax.Array:
    """MNIW log base measure from fused factorize+project outputs
    (batch-last; identical math to :func:`log_base_measure_bl`)."""
    n = fp.row_scale.shape[0]
    nu = fp.df
    out = -0.5 * n * m * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=nu.dtype))
    out = out + 0.5 * n * fp.logdet_T1
    out = out - 0.5 * nu * n * jnp.log(jnp.asarray(2.0, dtype=nu.dtype))
    out = out - jsp.special.multigammaln(nu / 2.0, n)
    out = out + 0.5 * nu * fp.logdet_Psi
    return out


def log_base_measure_from_factor_bl(factor: MNIWFactor) -> jax.Array:
    """Batch-last :func:`log_base_measure` from an existing factorization.

    Mathematically identical to ``log_base_measure_bl(prior + stats)`` when
    ``factor = factorize_scaled_bl(stats, prior)`` — the log-determinants
    come straight off the carried Cholesky diagonal and Schur complement,
    skipping the second full factorization the direct path performs.
    """
    n = factor.row_scale.shape[0]
    m = factor.chol.shape[0]
    logdet_T1 = bla.logdet_from_chol_bl(factor.chol)
    psi = factor.row_scale
    if n == 1:
        logdet_Psi = jnp.log(psi[0, 0])
    elif n == 2:
        off = 0.5 * (psi[0, 1] + psi[1, 0])
        logdet_Psi = jnp.log(psi[0, 0] * psi[1, 1] - off * off)
    else:
        sym = 0.5 * (psi + jnp.swapaxes(psi, 0, 1))
        logdet_Psi = bla.logdet_from_chol_bl(bla.chol_lower_bl(sym))
    nu = factor.df
    out = -0.5 * n * m * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=nu.dtype))
    out = out + 0.5 * n * logdet_T1
    out = out - 0.5 * nu * n * jnp.log(jnp.asarray(2.0, dtype=nu.dtype))
    out = out - jsp.special.multigammaln(nu / 2.0, n)
    out = out + 0.5 * nu * logdet_Psi
    return out


def factor_mean_at_bl(
    factor: MNIWFactor, phi: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """Posterior-mean prediction, batch-last: ``phi (m, N) -> (n, N)``."""
    if phi.ndim == 2 and _pallas_ok(factor.chol, use_pallas, m=factor.chol.shape[0]):
        from bipk_tpu.ops import pallas_kernels

        mean, _ = pallas_kernels.project_blocks(
            factor.chol, factor.white_T0, phi
        )
        return mean
    v = bla.solve_lower_bl(factor.chol, phi)
    n = factor.white_T0.shape[1]
    return jnp.stack(
        [jnp.sum(factor.white_T0[:, i] * v, axis=0) for i in range(n)]
    )


def sample_predictive_bl(
    key: jax.Array,
    factor: MNIWFactor,
    phi: jax.Array,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Fused matrix-t predictive + draw, batch-last.

    ``phi (m, N) -> draws (n, N)``; one batched Student-t call for the whole
    particle population (the batch-first path splits N keys per step).
    """
    n = factor.row_scale.shape[0]
    if phi.ndim == 2 and _pallas_ok(factor.chol, use_pallas, m=factor.chol.shape[0]):
        from bipk_tpu.ops import pallas_kernels

        mean, col_scale = pallas_kernels.project_blocks(
            factor.chol, factor.white_T0, phi
        )
    else:
        v = bla.solve_lower_bl(factor.chol, phi)
        mean = jnp.stack(
            [jnp.sum(factor.white_T0[:, i] * v, axis=0) for i in range(n)]
        )  # (n, N)
        col_scale = jnp.sum(v * v, axis=0) + 1.0  # (N,)
    df = factor.df + (1.0 - n)  # (N,)
    row_pred = factor.row_scale / df  # (n, n, N)
    chol_row = bla.chol_lower_bl(row_pred)
    from bipk_tpu.ops.gaussian import student_t

    t = student_t(key, df, (n,) + df.shape, phi.dtype)
    scaled = jnp.stack(
        [
            sum(chol_row[i, j] * t[j] for j in range(n))
            for i in range(n)
        ]
    )
    return mean + scaled * jnp.sqrt(col_scale)


def suff_stat_bl(y: jax.Array, phi: jax.Array) -> MNIW:
    """Rank-1 statistics, batch-last: ``y (n, N)``, ``phi (m, N)``."""
    return MNIW(
        phi[:, None, :] * y[None, :, :],
        phi[:, None, :] * phi[None, :, :],
        y[:, None, :] * y[None, :, :],
        jnp.ones(y.shape[-1], dtype=phi.dtype),
    )


# ---------------------------------------------------------------------------
# Flat batch-last layout: leaves (m*n, N), (m*m, N), (n*n, N), (N,).
#
# TPU (8, 128) tiling pads the second-to-last dim of every array to a
# multiple of 8 — an (m, 1, N) leaf bloats 8x and (m, m, N) by m -> 8k.
# Row-flattened leaves pad ~nothing, are the fast layout for resampling
# gathers, and avoid relayout copies between the per-step passes. The
# fused kernels read them with index arithmetic (``flat=True``).
# ---------------------------------------------------------------------------


def to_flat_bl(nat: MNIW) -> MNIW:
    """Structured batch-last leaves -> flat rows (one-time relayout)."""
    last = nat.T0.shape[-1]
    return MNIW(
        nat.T0.reshape(-1, last),
        nat.T1.reshape(-1, last),
        nat.T2.reshape(-1, last),
        nat.T3,
    )


def from_flat_bl(nat: MNIW, m: int, n: int) -> MNIW:
    """Flat rows -> structured batch-last leaves (one-time relayout)."""
    last = nat.T0.shape[-1]
    return MNIW(
        nat.T0.reshape(m, n, last),
        nat.T1.reshape(m, m, last),
        nat.T2.reshape(n, n, last),
        nat.T3,
    )


# ---------------------------------------------------------------------------
# Packed batch-last layout: ONE (m*n + m(m+1)/2 + n(n+1)/2 + 1, N) matrix
# per GP with rows [T0 | tril(T1) | tril(T2) | T3].
#
# The per-particle statistics are the dominant payload of a filter step
# (e.g. 2 x 422 rows x N on the vehicle workload in full-square form).
# Carrying them as ONE matrix lets the resampling gather run as a single
# 2-D lane-gather with no per-step concatenate/split (profiled at
# ~0.9 ms/step of pure layout churn at N = 32768 on v5e), and the fused
# kernels read/write the packed block directly with row-index arithmetic.
#
# T1 (phi phi^T sums) and T2 (y y^T sums) are symmetric by construction,
# so only the lower triangles ride the carry: row-major triangular
# storage ``tri[i(i+1)/2 + j] = X[i, j]`` for ``i >= j``. On the vehicle
# workload that shrinks the packed matrix from 422 to 232 rows per GP —
# the resampling gather (the dominant per-step cost at N = 32768) and
# every kernel read/write of the carry move ~45% fewer bytes. Packing
# symmetrizes (0.5 * (X + X^T)), matching the kernels' previous on-read
# symmetrization exactly for symmetric inputs.
# ---------------------------------------------------------------------------


def _tri_pack_idx(m: int):
    """Flat row indices (into an ``(m*m,)``-flattened square) of the lower
    triangle, COLUMN-major (column ``j`` = entries ``(j..m-1, j)``,
    contiguous), plus the transposed entries' indices.

    Column-major order makes each column of the symmetric matrix a
    contiguous row-slice of the packed layout — the column-on-sublanes
    Pallas kernels read ``A``'s Cholesky columns as static sublane slices
    (see ``pallas_kernels``)."""
    import numpy as np

    j, i = np.triu_indices(m)  # (row<=col) row-major == lower col-major
    return i * m + j, j * m + i


def tri_col_offset(j: int, m: int) -> int:
    """Offset of column ``j``'s diagonal entry in the column-major packed
    lower triangle: ``sum_{c<j} (m - c)``."""
    return j * m - (j * (j - 1)) // 2


def _tri_unpack_idx(m: int):
    """For each entry of the flattened square, the triangular row holding
    its value: ``full[i*m + j] = tri[off(min) + max - min]`` with
    ``off(c) = c*m - c(c-1)/2`` (column-major packing)."""
    import numpy as np

    i, j = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    hi, lo = np.maximum(i, j), np.minimum(i, j)
    return (lo * m - (lo * (lo - 1)) // 2 + hi - lo).reshape(-1)


def sym_to_tri_rows(X: jax.Array, m: int) -> jax.Array:
    """``(m*m, ...)`` flattened-square rows -> ``(m(m+1)/2, ...)``
    triangular rows of the symmetrized matrix ``0.5 * (X + X^T)``."""
    lower, upper = _tri_pack_idx(m)
    return 0.5 * (jnp.take(X, lower, axis=0) + jnp.take(X, upper, axis=0))


def tri_to_sym_rows(Xt: jax.Array, m: int) -> jax.Array:
    """Triangular rows -> full ``(m*m, ...)`` flattened-square rows."""
    return jnp.take(Xt, _tri_unpack_idx(m), axis=0)


def packed_rows(m: int, n: int) -> int:
    """Row count of the packed statistics layout."""
    return m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1


def pack_stats_bl(stats: MNIW) -> jax.Array:
    """Batch-last MNIW statistics (structured or flat) -> packed matrix."""
    if stats.T1.ndim != 2:
        stats = to_flat_bl(stats)
    m = int(round(stats.T1.shape[0] ** 0.5))
    n = int(round(stats.T2.shape[0] ** 0.5))
    return jnp.concatenate(
        [
            stats.T0,
            sym_to_tri_rows(stats.T1, m),
            sym_to_tri_rows(stats.T2, n),
            stats.T3[None],
        ],
        axis=0,
    )


def unpack_stats_bl(S: jax.Array, m: int, n: int) -> MNIW:
    """Packed matrix -> flat batch-last MNIW statistics (copies: the
    triangular T1/T2 rows are mirrored back to full squares)."""
    o1 = m * n
    o2 = o1 + m * (m + 1) // 2
    o3 = o2 + n * (n + 1) // 2
    return MNIW(
        S[:o1],
        tri_to_sym_rows(S[o1:o2], m),
        tri_to_sym_rows(S[o2:o3], n),
        S[o3],
    )


def unpack_reduced(red: jax.Array, m: int, n: int) -> MNIW:
    """An importance-weight-reduced packed column ``(rows,)`` ->
    structured unbatched MNIW (``(m, n)/(m, m)/(n, n)/()`` leaves)."""
    o1 = m * n
    o2 = o1 + m * (m + 1) // 2
    o3 = o2 + n * (n + 1) // 2
    return MNIW(
        red[:o1].reshape(m, n),
        tri_to_sym_rows(red[o1:o2], m).reshape(m, m),
        tri_to_sym_rows(red[o2:o3], n).reshape(n, n),
        red[o3],
    )


def factorize_project_packed_bl(
    S: jax.Array,
    phi: jax.Array,
    prior: MNIW | None = None,
    lam: float = 1.0,
    m: int = 0,
    n: int = 0,
    jitter: float | None = None,
    use_pallas: bool | None = None,
    emit_factor: bool = False,
):
    """:func:`factorize_project_bl` over the packed statistics layout.

    With ``emit_factor`` returns ``(ProjectedFactor, LW)`` where ``LW``
    is the packed ``[tril(L) | white]`` factor block for reuse by
    :func:`draw_update_gather_packed_bl` (or ``(fp, None)`` when the
    Pallas factor pair is unavailable for this m/backend — callers must
    handle the ``None``)."""
    if jitter is None:
        jitter = _default_jitter(S.dtype)
    if (
        n <= 2
        and phi.ndim == 2
        and _pallas_ok(S, use_pallas, m=m, small_out=True)
    ):
        from bipk_tpu.ops import pallas_kernels

        prior_blocks = (
            (prior.T0, prior.T1, prior.T2) if prior is not None else None
        )
        emit = emit_factor and pallas_kernels.supported_factor(m)
        out = pallas_kernels.factorize_project_packed(
            S, phi, float(jitter), float(lam), prior_blocks, m=m, n=n,
            emit_factor=emit,
        )
        mean, col, row, ld1, ldp = out[:5]
        t3 = S[-1].reshape(-1) if S.ndim == 3 else S[-1]
        df = t3 * lam + (prior.T3 if prior is not None else 0.0)
        fp = ProjectedFactor(mean, col, row, ld1, ldp, df)
        if emit_factor:
            return fp, (out[5] if emit else None)
        return fp
    if S.ndim == 3:
        S = S.reshape(S.shape[0], -1)
    fp = factorize_project_bl(
        unpack_stats_bl(S, m, n), phi, prior=prior, lam=lam, jitter=jitter,
        use_pallas=False,
    )
    return (fp, None) if emit_factor else fp


def draw_update_packed_bl(
    key: jax.Array,
    S: jax.Array,
    phi: jax.Array,
    prior: MNIW | None = None,
    lam: float = 1.0,
    m: int = 0,
    n: int = 0,
    jitter: float | None = None,
    use_pallas: bool | None = None,
):
    """Fused matrix-t predictive draw + rank-1 statistics update over the
    packed layout.

    Returns ``(S_new, y, logdet_T1, logdet_Psi)`` where ``y (n, N)`` is
    the predictive draw (``sample_projected_bl`` semantics, same RNG
    stream on both paths) and ``S_new = lam*S + suff(y, phi)``. On TPU the
    whole thing is ONE Pallas kernel: the factor, the per-particle
    predictive pieces, and the rank-1 outer products never touch HBM, and
    the statistics update costs no separate read-modify-write pass
    (reference per-step pipeline: ``/root/reference/src/Algorithm1.py:
    235-274`` then ``:367-375``).
    """
    if jitter is None:
        jitter = _default_jitter(S.dtype)
    if (
        n <= 2
        and phi.ndim == 2
        and _pallas_ok(S, use_pallas, m=m, small_out=True)
    ):
        from bipk_tpu.ops import pallas_kernels

        prior_blocks = (
            (prior.T0, prior.T1, prior.T2) if prior is not None else None
        )
        p3 = float(prior.T3) if prior is not None else 0.0
        key_u, key_v = jax.random.split(key)
        np_ = pallas_kernels.blocked_particles(S)
        u = jax.random.uniform(key_u, (n, np_), S.dtype)
        v = jax.random.uniform(key_v, (n, np_), S.dtype)
        return pallas_kernels.draw_update_packed_blocks(
            S, phi, u, v, float(jitter), float(lam), prior_blocks,
            p3=p3, m=m, n=n,
        )
    if S.ndim == 3:
        S = S.reshape(S.shape[0], -1)
    stats = unpack_stats_bl(S, m, n)
    fp = factorize_project_bl(
        stats, phi, prior=prior, lam=lam, jitter=jitter, use_pallas=False
    )
    y = sample_projected_bl(key, fp, S.dtype)
    suff = suff_stat_flat_bl(y, phi)
    if lam == 1.0:
        new = jax.tree_util.tree_map(lambda s, d: s + d, stats, suff)
    else:
        new = jax.tree_util.tree_map(
            lambda s, d: s * lam + d, stats, suff
        )
    return pack_stats_bl(new), y, fp.logdet_T1, fp.logdet_Psi


def draw_update_gather_packed_bl(
    key: jax.Array,
    S: jax.Array,
    ancestors: jax.Array,
    phi: jax.Array,
    prior: MNIW | None = None,
    lam: float = 1.0,
    m: int = 0,
    n: int = 0,
    jitter: float | None = None,
    use_pallas: bool | None = None,
    factor: jax.Array | None = None,
    fused: bool | None = None,
    _parts: bool = False,
):
    """Resampling gather + :func:`draw_update_packed_bl`, same RNG stream
    (bitwise-identical results on TPU) on every path.

    ``_parts=True`` (private, for :meth:`APFKernel.
    draw_update_gather_all_packed`'s MERGED dispatch) returns
    ``(fits, fused_fn, fallback_fn)`` instead of the ``lax.cond``
    result when this call would take the 2-way conditional dispatch,
    and ``None`` on every other path — multiple GPs sharing one
    ancestor vector then share ONE ``lax.cond`` (same ``fits`` on
    every GP), halving the per-step conditional fixed overhead.

    Default: conditional in-kernel-gather dispatch — the windowed fused
    kernel when every block's ancestor span fits the contiguous lane
    window, exact XLA gather + draw kernel otherwise. This was the best
    of five structures measured head-to-head on the vehicle APF in round
    5 (one v5e chip, N = 32768, degenerate weights, DESIGN.md round-5
    ledger): 2-way cond 31.1M psps, 3-tier cond with the dedup-window
    kernel 28.1M, unconditional separate gather 28.3-30.1M. The losing
    alternatives stay behind flags because each embodies a real measured
    effect worth re-testing on future hardware/compilers:

    - ``fused=False`` / ``BIPK_SEPARATE_GATHER=1``: NO ``lax.cond`` at
      all (every conditional boundary on the ~30 MB statistics forces
      XLA buffer copies, ~40-90 us each) — but losing the windowed
      kernel on the ~1/3 of steps where it fits costs more.
    - ``BIPK_DEDUP_GATHER=1``: adds the dedup-window kernel
      (distinct-tile staging) as a middle tier for degenerate-weight
      steps whose SPAN overflows but whose distinct tiles fit; the
      kernel itself is bitwise-correct and ~its XLA-fallback's speed,
      so the extra cond tier's boundary copies make it a net loss.

    ``ancestors (N,)`` must be non-decreasing (systematic-resampling
    output, ``/root/reference/src/Filtering.py:28-35``).
    """
    if jitter is None:
        jitter = _default_jitter(S.dtype)
    if not (
        n <= 2
        and phi.ndim == 2
        and _pallas_ok(S, use_pallas, m=m, gather=True)
    ):
        if _parts:
            return None
        S_g = jnp.take(S, ancestors, axis=-1, indices_are_sorted=True)
        return draw_update_packed_bl(
            key, S_g, phi, prior=prior, lam=lam, m=m, n=n, jitter=jitter,
            use_pallas=use_pallas,
        )
    from bipk_tpu.ops import pallas_kernels as pk

    n_in = pk.blocked_particles(S)
    N = ancestors.shape[-1]
    total_in = -(-n_in // 128) * 128
    block, wt, use_cs = pk.gather_plan(m, n, total_in, S.dtype)
    if fused is None:
        if os.environ.get("BIPK_SEPARATE_GATHER"):
            fused = False
        elif os.environ.get("BIPK_FUSED_GATHER"):
            fused = True
        else:
            # shape-dependent default, measured round 5 (v5e): at
            # N = 32768 the fused dispatch wins (31.1 vs 28.3M psps);
            # at N = 10240 (the Gibbs/cSMC configuration) the
            # unconditional separate path wins (0.68 vs 0.79 s/sweep) —
            # the lax.cond boundary copies shrink with N but the cond
            # overhead does not. The cs layout (m > 24) always wants
            # the fused kernels (16.0 vs 10.4M psps on the SMO bench).
            fused = use_cs or n_in > 16384
    if not fused:
        if _parts:
            return None
        # UNCONDITIONAL path (see docstring): sorted XLA gather + fused
        # draw/update kernel — no lax.cond, no 30-MB boundary copies
        S_flat = S.reshape(S.shape[0], -1) if S.ndim == 3 else S
        S_g = jnp.take(S_flat, ancestors, axis=-1, indices_are_sorted=True)
        return draw_update_packed_bl(
            key, S_g, phi, prior=prior, lam=lam, m=m, n=n, jitter=jitter,
            use_pallas=use_pallas,
        )
    total = -(-N // block) * block
    anc = ancestors.astype(jnp.int32)
    anc_padded = (
        jnp.pad(anc, (0, total - N), constant_values=n_in - 1)
        if total != N else anc
    )
    w, fits = pk.window_starts(
        anc_padded, total_in, block=block, window_tiles=wt,
        align=8 if S.ndim == 3 else 1,
    )

    prior_blocks = (
        (prior.T0, prior.T1, prior.T2) if prior is not None else None
    )
    p3 = float(prior.T3) if prior is not None else 0.0
    key_u, key_v = jax.random.split(key)
    u = jax.random.uniform(key_u, (n, N), S.dtype)
    v = jax.random.uniform(key_v, (n, N), S.dtype)

    use_factor = factor is not None and pk.supported_factor(m)

    def fused_branch(_):
        if use_factor:
            # reuse the auxiliary kernel's factor: the draw skips the
            # O(m^3/6) refactorization (its dominant, spill-bound term)
            return pk.draw_update_factor_gather_packed_blocks(
                S, factor, anc, w, phi, u, v, float(jitter), float(lam),
                prior_blocks, p3=p3, m=m, n=n,
            )
        return pk.draw_update_gather_packed_blocks(
            S, anc, w, phi, u, v, float(jitter), float(lam),
            prior_blocks, p3=p3, m=m, n=n,
        )

    def fallback(_):
        # Last resort under degenerate weights (low ESS): the sorted XLA
        # gather streams the statistics at ~1.7x the pure-streaming floor
        # (~126 us/GP at N = 32768) but materializes the gathered copy in
        # HBM (write + kernel re-read). A COLUMN-dedup rewrite (gather
        # the D distinct columns, then remap) was measured worse: a
        # (232, 2048) column gather from the row-major (232, N) layout
        # reads one ~512 B burst per row per column — ~64x HBM
        # amplification, 287 us for 1.9 MB of payload. The TILE-dedup
        # kernel avoids both and handles almost every degenerate step
        # when enabled; by default this path fires whenever the
        # contiguous window overflows.
        S_flat = S.reshape(S.shape[0], -1) if S.ndim == 3 else S
        S_g = jnp.take(S_flat, anc, axis=-1, indices_are_sorted=True)
        S_new, y_, l1_, lp_ = pk.draw_update_packed_blocks(
            S_g, phi, u, v, float(jitter), float(lam), prior_blocks,
            p3=p3, m=m, n=n,
        )
        if S.ndim == 3:
            # the blocked-carry cond branches must return matching shapes
            S_new = S_new.reshape(S.shape[0], -1, 128)
        return S_new, y_, l1_, lp_

    two_way = (
        use_cs
        or use_factor
        or S.ndim == 3  # dedup wrapper not taught the blocked carry yet
        or not pk.dedup_supported(total_in)
        or not os.environ.get("BIPK_DEDUP_GATHER")
    )
    if _parts:
        # only the 2-way structure merges across GPs; the 3-tier dedup
        # dispatch keeps its per-GP conds
        return (fits, fused_branch, fallback) if two_way else None
    if two_way:
        return jax.lax.cond(fits, fused_branch, fallback, None)

    # Degenerate-weight regime (vehicle APF: median ESS ~12 of 32768):
    # a block's ancestors SPAN most of the source array (long offspring
    # runs separated by wide zero-offspring gaps) while touching only a
    # few DISTINCT source tiles — the contiguous window can't fit them,
    # but the dedup-window kernel stages exactly the distinct tiles and
    # keeps the gather fused (~one streaming read instead of the
    # 4-pass gather+draw fallback). Plan arithmetic (the per-block rank
    # cumsum) runs inside the branch, so fitting steps never pay it.
    wdt = pk.dedup_window_tiles(total_in)
    fits_dedup = pk.dedup_fits(anc_padded, block, wdt)

    def dedup(_):
        local_anc, tids = pk.dedup_plan(
            anc_padded, block, wdt, total_in // 128
        )
        snew, y, ld1, ldp = pk.draw_update_dedup_gather_packed_blocks(
            S, local_anc, tids, phi, u, v, float(jitter), float(lam),
            prior_blocks, p3=p3, m=m, n=n, wtiles=wdt,
        )
        return snew[:, :N], y[:, :N], ld1[:N], ldp[:N]

    def non_fitting(_):
        return jax.lax.cond(fits_dedup, dedup, fallback, None)

    return jax.lax.cond(fits, fused_branch, non_fitting, None)


def pack_suff_col(y: jax.Array, phi: jax.Array) -> jax.Array:
    """Packed-layout rank-1 sufficient statistics of ONE datum:
    ``y (n,)``, ``phi (m,)`` -> ``(rows,)`` column (rows as in
    :func:`packed_rows`)."""
    return pack_stats_bl(
        suff_stat_flat_bl(y[:, None], phi[:, None])
    )[:, 0]


def suff_stat_flat_bl(
    y: jax.Array, phi: jax.Array, via_gather: bool = False
) -> MNIW:
    """Rank-1 statistics in flat layout: ``y (n, N)``, ``phi (m, N)`` ->
    leaves ``(m*n, N)``, ``(m*m, N)``, ``(n*n, N)``, ``(N,)``.

    Row ``i*n + c`` of T0 is ``phi_i y_c`` etc. Two lowerings, identical
    math, context-dependent performance on v5e (see
    ``APFKernel.update_stats`` for the measured selection rule):

    - default: reshape(broadcast-multiply) — XLA fuses the broadcast and
      the row merge into the consuming add (vehicle cSMC sweep: 1.19 s vs
      1.57 s for the gather form);
    - ``via_gather``: static-index row gathers of the small inputs (the
      vehicle APF sweep with forgetting: 8.17M vs 7.97M psps).
    """
    m = phi.shape[0]
    n = y.shape[0]
    last = phi.shape[-1]
    if via_gather:
        import numpy as _np

        ar_m = _np.arange(m)
        ar_n = _np.arange(n)
        T0 = jnp.take(phi, _np.repeat(ar_m, n), axis=0) * jnp.take(
            y, _np.tile(ar_n, m), axis=0
        )
        T1 = jnp.take(phi, _np.repeat(ar_m, m), axis=0) * jnp.take(
            phi, _np.tile(ar_m, m), axis=0
        )
        T2 = jnp.take(y, _np.repeat(ar_n, n), axis=0) * jnp.take(
            y, _np.tile(ar_n, n), axis=0
        )
    else:
        T0 = (phi[:, None, :] * y[None, :, :]).reshape(m * n, last)
        T1 = (phi[:, None, :] * phi[None, :, :]).reshape(m * m, last)
        T2 = (y[:, None, :] * y[None, :, :]).reshape(n * n, last)
    return MNIW(T0, T1, T2, jnp.ones(last, dtype=phi.dtype))


def log_base_measure_bl(
    nat: MNIW, use_pallas: bool | None = None,
    m: int | None = None, n: int | None = None,
) -> jax.Array:
    """Batch-last :func:`log_base_measure`: returns ``(N,)``.

    ``nat`` may be structured or flat (pass ``m``/``n`` for flat leaves)."""
    flat = nat.T1.ndim == 2
    if not flat:
        n = nat.T2.shape[0]
        m = nat.T1.shape[0]
    jitter = _default_jitter(nat.T1.dtype)
    if n <= 2 and _pallas_ok(nat, use_pallas, m=m, small_out=True):
        from bipk_tpu.ops import pallas_kernels

        logdet_T1, logdet_Psi = pallas_kernels.log_base_measure_logdets(
            nat.T0, nat.T1, nat.T2, float(jitter), m=m, n=n
        )
    else:
        if flat:
            nat = from_flat_bl(nat, m, n)
        T1s = 0.5 * (nat.T1 + jnp.swapaxes(nat.T1, 0, 1))
        if jitter:
            trace = sum(T1s[i, i] for i in range(m)) / m
            T1s = T1s + (jitter * trace) * jnp.eye(m, dtype=T1s.dtype)[:, :, None]
        L1 = bla.chol_lower_bl(T1s)
        white = bla.solve_lower_bl(L1, nat.T0)
        Psi = nat.T2 - _gram_bl(white)
        Psi = 0.5 * (Psi + jnp.swapaxes(Psi, 0, 1))
        logdet_T1 = bla.logdet_from_chol_bl(L1)
        logdet_Psi = bla.logdet_from_chol_bl(bla.chol_lower_bl(Psi))
    nu = nat.T3
    out = -0.5 * n * m * jnp.log(jnp.asarray(2.0 * jnp.pi, dtype=nu.dtype))
    out = out + 0.5 * n * logdet_T1
    out = out - 0.5 * nu * n * jnp.log(jnp.asarray(2.0, dtype=nu.dtype))
    out = out - jsp.special.multigammaln(nu / 2.0, n)
    out = out + 0.5 * nu * logdet_Psi
    return out


def log_base_measure_packed_bl(
    S: jax.Array,
    prior_eff: MNIW | None,
    m: int,
    n: int,
    use_pallas: bool | None = None,
) -> jax.Array:
    """:func:`log_base_measure_bl` of ``prior_eff + stats`` over the
    packed layout.

    ``prior_eff`` is a small unbatched MNIW offset (e.g. ``prior +
    ref_future_stats`` in the cSMC ancestor weights,
    ``/root/reference/src/Algorithm3.py:92-106``) folded into the kernel —
    the full per-particle sum is never materialized.
    """
    jitter = _default_jitter(S.dtype)
    nu = S[-1] + (prior_eff.T3 if prior_eff is not None else 0.0)
    if n <= 2 and _pallas_ok(S, use_pallas, m=m, small_out=True):
        from bipk_tpu.ops import pallas_kernels

        pe = (
            (prior_eff.T0, prior_eff.T1, prior_eff.T2)
            if prior_eff is not None else None
        )
        logdet_T1, logdet_Psi = (
            pallas_kernels.log_base_measure_packed_logdets(
                S, float(jitter), pe, m=m, n=n
            )
        )
        out = -0.5 * n * m * jnp.log(
            jnp.asarray(2.0 * jnp.pi, dtype=nu.dtype)
        )
        out = out + 0.5 * n * logdet_T1
        out = out - 0.5 * nu * n * jnp.log(jnp.asarray(2.0, dtype=nu.dtype))
        out = out - jsp.special.multigammaln(nu / 2.0, n)
        out = out + 0.5 * nu * logdet_Psi
        return out
    stats = unpack_stats_bl(S, m, n)
    if prior_eff is not None:
        stats = MNIW(
            stats.T0 + prior_eff.T0.reshape(-1, 1),
            stats.T1 + prior_eff.T1.reshape(-1, 1),
            stats.T2 + prior_eff.T2.reshape(-1, 1),
            nu,
        )
    return log_base_measure_bl(stats, use_pallas=False, m=m, n=n)


def to_batch_last(nat: MNIW) -> MNIW:
    """``(N, ...)`` leaves -> batch-last layout."""
    return MNIW(
        jnp.moveaxis(nat.T0, 0, -1),
        jnp.moveaxis(nat.T1, 0, -1),
        jnp.moveaxis(nat.T2, 0, -1),
        nat.T3,
    )


def from_batch_last(nat: MNIW) -> MNIW:
    """Batch-last leaves -> ``(N, ...)`` layout."""
    return MNIW(
        jnp.moveaxis(nat.T0, -1, 0),
        jnp.moveaxis(nat.T1, -1, 0),
        jnp.moveaxis(nat.T2, -1, 0),
        nat.T3,
    )
