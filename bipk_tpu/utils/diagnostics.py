"""MCMC convergence diagnostics for multi-chain Gibbs runs.

The reference runs a single PGAS chain per workload and judges convergence
visually from the figure scripts (SURVEY.md §4 — it has no quantitative
convergence check at all). With chain-parallel sampling
(``build_gibbs(..., n_chains=C)`` — C independent chains vmapped into one
device program) the standard cross-chain diagnostics become available:

- :func:`split_rhat` — potential scale reduction factor (Gelman–Rubin),
  computed on split chains so within-chain non-stationarity is detected
  even with few chains.
- :func:`rank_normalized_rhat` — the Vehtari et al. (2021) robustified
  variant: rank-normalize the draws first, so heavy tails and scale
  differences cannot mask mixing failures.
- :func:`ess_mean` — bulk effective sample size from chain-averaged
  autocorrelations (Geyer initial-positive-sequence truncation).

All functions take draws shaped ``(n_chains, n_draws, ...)`` and reduce the
first two axes, returning per-quantity arrays of the trailing shape. They
are plain ``jax.numpy`` and run fine on CPU; these are host-side
post-processing utilities, not hot-path code.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import stats as _sps


def _split(draws):
    """Split each chain in half: (C, K, ...) -> (2C, K//2, ...)."""
    draws = jnp.asarray(draws)
    c, k = draws.shape[:2]
    half = k // 2
    draws = draws[:, : 2 * half]
    return draws.reshape((2 * c, half) + draws.shape[2:])


def split_rhat(draws) -> jnp.ndarray:
    """Split-chain potential scale reduction factor.

    ``draws`` is ``(n_chains, n_draws, ...)``; returns the trailing shape.
    Values near 1 indicate the chains agree; > 1.01 is the usual
    "keep sampling" threshold (Vehtari et al. 2021).
    """
    x = _split(draws)
    c, k = x.shape[:2]
    if k < 2:
        raise ValueError(f"need at least 4 draws per chain, got {draws.shape}")
    chain_mean = jnp.mean(x, axis=1)  # (2C, ...)
    chain_var = jnp.var(x, axis=1, ddof=1)  # (2C, ...)
    between = k * jnp.var(chain_mean, axis=0, ddof=1)
    within = jnp.mean(chain_var, axis=0)
    var_plus = (k - 1) / k * within + between / k
    return jnp.sqrt(var_plus / jnp.maximum(within, 1e-300))


def rank_normalized_rhat(draws, folded: bool = False) -> jnp.ndarray:
    """Split-R-hat of rank-normalized draws (Vehtari et al. 2021, eq. 14).

    Pools all draws, replaces each by its normal score
    ``Phi^{-1}((rank - 3/8) / (S + 1/4))``, then computes :func:`split_rhat`
    on the transformed chains. Robust to heavy tails. With ``folded=True``
    the draws are first folded around the pooled median
    (``|x - median|``), which turns *scale* disagreement between chains
    into *location* disagreement R-hat can see.
    """
    x = np.asarray(draws, dtype=np.float64)
    if folded:
        x = np.abs(x - np.median(x.reshape(-1, *x.shape[2:]), axis=0))
    flat = x.reshape(-1, *x.shape[2:])
    s = flat.shape[0]
    ranks = _sps.rankdata(flat, axis=0, method="average")
    z = _sps.norm.ppf((ranks - 0.375) / (s + 0.25))
    return split_rhat(z.reshape(x.shape))


def rhat(draws) -> jnp.ndarray:
    """The Vehtari et al. (2021) convergence summary: the elementwise max
    of the rank-normalized split-R-hat (location mixing) and its folded
    variant (scale/tail mixing). Keep sampling while it exceeds ~1.01.
    """
    return jnp.maximum(
        rank_normalized_rhat(draws),
        rank_normalized_rhat(draws, folded=True),
    )


def gibbs_chain_summary(int_vars, n_burn: int) -> list:
    """Convergence summary of a chain-parallel ``GibbsResult``.

    ``int_vars`` is the result's tuple of interface-variable traces, each
    ``(C, T, K, n_i)``; the scalar summary per draw is the trajectory mean
    of the first component. Returns one dict per learned function:
    ``{"rhat", "ess", "n_draws"}`` over the post-burn-in draws. Runs too
    short to diagnose (fewer than 4 post-burn-in draws per chain — split
    R-hat needs 2 per half) report NaNs rather than raising: summarizing a
    finished sampling run must never crash it.
    """
    out = []
    for v in int_vars:
        draws = np.asarray(v)[:, :, n_burn:, 0].mean(axis=1)  # (C, K-burn)
        # constant draws (every chain glued to its reference) make R-hat
        # 0/0: the conditional SMC is degenerate at this particle count —
        # report that explicitly rather than a NaN
        stuck = bool(np.ptp(draws) == 0.0)
        too_short = draws.shape[1] < 4
        out.append(
            {
                "rhat": float("nan") if stuck or too_short
                else float(rhat(draws)),
                "ess": float("nan") if stuck or too_short
                else float(ess_mean(draws)),
                "n_draws": int(draws.size),
                "stuck": stuck,
            }
        )
    return out


def ess_mean(draws) -> jnp.ndarray:
    """Bulk effective sample size across chains.

    Chain-averaged autocorrelations with Geyer's initial-positive-sequence
    truncation: sum consecutive autocorrelation pairs until a pair goes
    non-positive. ``draws`` is ``(n_chains, n_draws, ...)``.
    """
    x = np.asarray(draws, dtype=np.float64)
    c, k = x.shape[:2]
    trail = x.shape[2:]
    x2 = x.reshape(c, k, -1)
    out = np.empty(x2.shape[2])
    for q in range(x2.shape[2]):
        xc = x2[:, :, q]
        chain_var = xc.var(axis=1, ddof=1)
        w = chain_var.mean()
        b_over_k = xc.mean(axis=1).var(ddof=1) if c > 1 else 0.0
        var_plus = (k - 1) / k * w + b_over_k
        if var_plus <= 0:
            out[q] = c * k
            continue
        xm = xc - xc.mean(axis=1, keepdims=True)
        # FFT autocovariance per chain (biased, /k, as in Stan)
        nfft = 1 << (2 * k - 1).bit_length()
        f = np.fft.rfft(xm, nfft, axis=1)
        acov = np.fft.irfft(f * np.conj(f), nfft, axis=1)[:, :k] / k
        # rho_t = 1 - (W - mean_chain_acov_t) / var_plus  (Stan eq.)
        rho = 1.0 - (w - acov.mean(axis=0)) / var_plus
        # Geyer: sum rho[2t] + rho[2t+1] while the pair stays positive
        tau = rho[0]  # = 1 up to the ddof correction
        t = 1
        while t + 1 < k:
            pair = rho[t] + rho[t + 1]
            if pair <= 0:
                break
            tau += 2.0 * pair
            t += 2
        out[q] = c * k / max(tau, 1.0 / (c * k))
    return jnp.asarray(out.reshape(trail) if trail else out[0])
