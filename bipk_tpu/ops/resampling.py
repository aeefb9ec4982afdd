"""Particle resampling primitives — jittable, scan- and shard-friendly.

Parity target: ``systematic_SISR`` and ``reconstruct_trajectory``
(``/root/reference/src/Filtering.py:6-55``). The backward ancestral
reconstruction — a host-side numpy loop in the reference — is a reverse
``lax.scan`` here so whole PGAS sweeps stay on device.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from bipk_tpu.ops import pallas_kernels as pk


def normalize_weights(weights: jax.Array) -> jax.Array:
    """Clip to non-negative and normalize; uniform fallback on zero mass.

    Parity with ``/root/reference/src/Filtering.py:23-25``.
    """
    n = weights.shape[-1]
    w = jnp.clip(weights, 0.0, jnp.inf)
    total = jnp.sum(w, axis=-1, keepdims=True)
    uniform = jnp.ones_like(w) / n
    return jnp.where(total > 0, w / total, uniform)


def systematic(key: jax.Array, weights: jax.Array) -> jax.Array:
    """Systematic resampling: one shared uniform offset, stratified grid.

    Takes unnormalized non-log weights, returns ``(N,)`` int32 ancestor
    indices (sorted). Semantics parity with ``systematic_SISR``
    (``/root/reference/src/Filtering.py:6-37``), but instead of a
    ``searchsorted`` of the stratified grid into the CDF (17 gather rounds
    of binary search — 17.5 ms at N = 131072 on v5e) this computes each
    input's offspring *count* in closed form and converts counts to sorted
    ancestor indices with one scatter-add + cumulative sum (1.9 ms). The
    two differ only on exact floating-point ties of grid and CDF points.
    """
    n = weights.shape[-1]
    w = normalize_weights(weights)
    u = jax.random.uniform(key, dtype=w.dtype)
    if (
        pk.enabled()
        and pk.supported_resample(n)
        and weights.ndim == 1
        and not os.environ.get("BIPK_DISABLE_RESAMPLE_KERNEL")
    ):
        # whole-population fused kernel: MXU-matmul prefix sums + a
        # scatterless counts->ancestors merge (~305 us -> ~40 us at
        # N = 32768 on v5e); same closed-form-offspring semantics, CDF
        # rounding may differ at exact ties by one output slot
        return pk.systematic_ancestors_blocks(w, u, n)
    cdf = jnp.cumsum(w, axis=-1)
    # grid points are (u + k)/n; input i owns those with (u+k)/n < cdf_i,
    # i.e. k < n*cdf_i - u  =>  cumulative count ceil(n*cdf_i - u)
    counts_cum = jnp.clip(
        jnp.ceil(n * cdf - u).astype(jnp.int32), 0, n
    )
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), counts_cum[:-1]]
    )
    # starts == n (inputs after the mass is exhausted) fall off the end and
    # are dropped — clipping them to n-1 would corrupt the last slot
    marker = (
        jnp.zeros((n,), jnp.int32)
        .at[starts]
        .add(jnp.ones((n,), jnp.int32), mode="drop")
    )
    return jnp.clip(jnp.cumsum(marker) - 1, 0, n - 1)


def systematic_searchsorted(key: jax.Array, weights: jax.Array) -> jax.Array:
    """Reference-style systematic resampling via CDF ``searchsorted``
    (``/root/reference/src/Filtering.py:28-35``); used to cross-validate
    the scatter-based implementation."""
    n = weights.shape[-1]
    w = normalize_weights(weights)
    u = jax.random.uniform(key, dtype=w.dtype)
    grid = (u + jnp.arange(n, dtype=w.dtype)) / n
    cdf = jnp.clip(jnp.cumsum(w, axis=-1), 0.0, 1.0)
    idx = jnp.searchsorted(cdf, grid)
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def categorical_from_weights(key: jax.Array, weights: jax.Array) -> jax.Array:
    """Single categorical draw via inverse-CDF on normalized weights.

    Used for ancestor draws of the reference particle and for picking an
    output trajectory (``/root/reference/src/Algorithm3.py:118-125,291-293``).
    """
    cdf = jnp.cumsum(weights, axis=-1)
    u = jax.random.uniform(key, dtype=weights.dtype)
    idx = jnp.searchsorted(cdf, u)
    return jnp.clip(idx, 0, weights.shape[-1] - 1).astype(jnp.int32)


def effective_sample_size(log_weights: jax.Array) -> jax.Array:
    """ESS of log-weights: ``1 / sum(w_i^2)`` with normalized ``w``."""
    w = jax.nn.softmax(log_weights, axis=-1)
    return 1.0 / jnp.sum(w * w, axis=-1)


def reconstruct_trajectory(
    particles: jax.Array, ancestry: jax.Array, final_index: jax.Array
):
    """Follow ancestor indices backward to extract one particle trajectory.

    ``particles`` is a pytree of ``(T, N, ...)`` traces, ``ancestry`` is
    ``(T-1, N)`` where ``ancestry[t, j]`` is the time-``t`` ancestor of
    particle ``j`` at time ``t+1``. Returns the pytree of ``(T, ...)``
    trajectories. Device-side reverse scan replacing the host loop at
    ``/root/reference/src/Filtering.py:40-55``.
    """
    final_index = jnp.asarray(final_index, dtype=jnp.int32)

    def backward(idx, ancestors_t):
        prev = ancestors_t[idx].astype(jnp.int32)
        return prev, prev

    _, indices = jax.lax.scan(backward, final_index, ancestry, reverse=True)
    indices = jnp.concatenate([indices, final_index[None]])

    def gather(trace):
        return jax.vmap(lambda row, i: row[i])(trace, indices)

    return jax.tree_util.tree_map(gather, particles), indices


def reconstruct_trajectory_bl(
    particles, ancestry: jax.Array, final_index: jax.Array
):
    """Batch-last :func:`reconstruct_trajectory`.

    ``particles`` is a pytree of ``(T, ..., N)`` traces with the particle
    axis LAST. Keeping the particle axis in lanes matters: a ``(T, N, d)``
    trace with ``d`` of 1-2 forces XLA to tile-pad the lane dimension to
    128 when the trace feeds a scan/gather — a 64x HBM blowup measured as
    a 25 GB allocation (OOM) on the 32k-particle vehicle cSMC sweep. The
    ``(T, d, N)`` layout pads only ``d`` to 8 sublanes.
    """
    final_index = jnp.asarray(final_index, dtype=jnp.int32)

    def backward(idx, ancestors_t):
        prev = ancestors_t[idx].astype(jnp.int32)
        return prev, prev

    _, indices = jax.lax.scan(backward, final_index, ancestry, reverse=True)
    indices = jnp.concatenate([indices, final_index[None]])

    def gather(trace):
        return jax.vmap(lambda slc, i: slc[..., i])(trace, indices)

    return jax.tree_util.tree_map(gather, particles), indices
