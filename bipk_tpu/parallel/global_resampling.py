"""Exact global systematic resampling across a particle-sharded mesh.

Reproduces the reference's single-device global systematic resampling
semantics (stratified grid against the global weight CDF,
``/root/reference/src/Filtering.py:28-35``) when the particle axis is
sharded over a mesh — in contrast to the cheaper *local* resampling scheme
in :mod:`bipk_tpu.parallel.sharded`, which resamples each shard from its
locally renormalized weights (statistically valid but a different scheme).

Design (all static shapes, ICI-friendly collectives):

1. **Offspring counts in closed form.** With global normalized weights
   ``w`` and one shared uniform ``u``, input ``i``'s cumulative offspring
   count is ``clip(ceil(N*cdf_i - u), 0, N)``. Each shard computes its own
   CDF slice from an ``all_gather`` of the per-shard masses (``n_dev``
   scalars) — no weight vector ever crosses chips.
2. **Global ancestor indices.** Every shard scatters ``1`` at its inputs'
   start slots into an ``(N,)`` int32 buffer; a ``psum`` makes the marker
   global and a local cumsum turns it into the sorted global ancestor
   vector (identical math to the single-chip scatter formulation in
   ``bipk_tpu.ops.resampling.systematic``). The replicated ``(N,)`` int32
   buffer is the only O(N) replicated object (4 MB at 1M particles).
3. **Payload redistribution on a ring.** Because systematic ancestors are
   sorted, every shard needs a *contiguous* index range of inputs, but that
   range may span chips. The payloads (state, interface variables, MNIW
   factors/statistics) rotate around the mesh with ``ppermute``; at each of
   the ``n_dev`` rounds a shard mask-gathers whatever of its ancestors live
   in the block it currently holds. Memory stays ``2x`` the local payload;
   total traffic is one full rotation — exactly the bisection-friendly ring
   pattern TPU ICI is built for.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def global_systematic_slice(
    key: jax.Array, w_local: jax.Array, axis_name: str, n_dev: int
) -> jax.Array:
    """This shard's slice of the global sorted systematic ancestor vector.

    ``w_local`` is this shard's slice of the *globally normalized* weights.
    ``key`` must be identical on every shard (do not ``fold_in`` the shard
    index) so the shared stratification offset ``u`` matches the
    single-chip draw. Returns ``(n_loc,)`` int32 **global** particle
    indices for this shard's output slots.
    """
    n_loc = w_local.shape[0]
    n_total = n_loc * n_dev
    u = jax.random.uniform(key, dtype=w_local.dtype)

    mass = jnp.sum(w_local)
    masses = jax.lax.all_gather(mass, axis_name)  # (n_dev,)
    me = jax.lax.axis_index(axis_name)
    prefix = jnp.sum(
        jnp.where(jnp.arange(n_dev) < me, masses, jnp.zeros_like(masses))
    )

    cdf = prefix + jnp.cumsum(w_local)
    counts_cum = jnp.clip(
        jnp.ceil(n_total * cdf - u).astype(jnp.int32), 0, n_total
    )
    # cumulative count just before this shard's first input — closed form
    # from the mass prefix, consistent with the previous shard's last entry
    prev_last = jnp.clip(
        jnp.ceil(n_total * prefix - u).astype(jnp.int32), 0, n_total
    )
    starts = jnp.concatenate([prev_last[None], counts_cum[:-1]])

    marker = (
        jnp.zeros((n_total,), jnp.int32)
        .at[starts]
        .add(jnp.ones((n_loc,), jnp.int32), mode="drop")
    )
    marker = jax.lax.psum(marker, axis_name)
    ancestors = jnp.clip(jnp.cumsum(marker) - 1, 0, n_total - 1)
    return jax.lax.dynamic_slice(ancestors, (me * n_loc,), (n_loc,))


def global_categorical(
    key: jax.Array, w_local: jax.Array, axis_name: str, n_dev: int
) -> jax.Array:
    """One categorical draw over globally-normalized sharded weights.

    ``w_local`` is this shard's slice of the globally normalized weights
    and ``key`` must be identical on every shard. Returns the (replicated)
    int32 **global** index of the drawn particle — the inverse-CDF draw of
    ``bipk_tpu.ops.resampling.categorical_from_weights`` evaluated on the
    distributed CDF: each shard offsets its local cumulative sum by the
    all-gathered mass prefix and proposes its first crossing; a ``pmin``
    picks the global first crossing. Used for the reference particle's
    ancestor draw in the sharded cSMC.
    """
    n_loc = w_local.shape[0]
    n_total = n_loc * n_dev
    u = jax.random.uniform(key, dtype=w_local.dtype)

    mass = jnp.sum(w_local)
    masses = jax.lax.all_gather(mass, axis_name)
    me = jax.lax.axis_index(axis_name)
    prefix = jnp.sum(
        jnp.where(jnp.arange(n_dev) < me, masses, jnp.zeros_like(masses))
    )
    cdf = prefix + jnp.cumsum(w_local)
    mask = cdf >= u
    local_idx = jnp.argmax(mask)
    cand = jnp.where(
        jnp.any(mask), me * n_loc + local_idx, n_total
    ).astype(jnp.int32)
    idx = jax.lax.pmin(cand, axis_name)
    return jnp.clip(idx, 0, n_total - 1)


def _gather_last(a: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather along the last (particle) axis; flatten >2-D first (TPU
    gathers of >2-D operands lower ~10x slower, see ``APFKernel.gather``)."""
    if a.ndim <= 2:
        return jnp.take(a, idx, axis=-1)
    flat = a.reshape(-1, a.shape[-1])
    return jnp.take(flat, idx, axis=-1).reshape(a.shape[:-1] + idx.shape)


def ring_redistribute(
    tree, ancestors_global: jax.Array, axis_name: str, n_dev: int
):
    """Fetch cross-shard ancestor payloads with ``n_dev`` ring rotations.

    ``tree`` is a pytree of batch-last arrays (last axis = this shard's
    ``n_loc`` particles). ``ancestors_global`` is this shard's ``(n_loc,)``
    slice of global ancestor indices (from
    :func:`global_systematic_slice`). Returns the pytree with every output
    slot holding its ancestor's payload, wherever that ancestor lived.
    """
    n_loc = ancestors_global.shape[0]
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    # pack every leaf into one (K, n_loc) matrix so each of the n_dev
    # rounds performs ONE gather and ONE ppermute (TPU gathers are per-op
    # latency-bound — see APFKernel.packed_gather)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    rows = [
        leaf.reshape((-1, n_loc)) if leaf.ndim != 2 else leaf
        for leaf in leaves
    ]
    sizes = [r.shape[0] for r in rows]
    packed = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]

    def body(r, carry):
        out, block = carry
        src = jnp.mod(me - r, n_dev)  # origin shard of the block we hold
        idx = ancestors_global - src * n_loc
        mask = (idx >= 0) & (idx < n_loc)
        safe = jnp.clip(idx, 0, n_loc - 1)
        g = jnp.take(block, safe, axis=-1)
        out = jnp.where(mask[None, :], g, out)
        block = jax.lax.ppermute(block, axis_name, perm)
        return out, block

    out, _ = jax.lax.fori_loop(
        0, n_dev, body, (jnp.zeros_like(packed), packed)
    )

    offsets, total = [], 0
    for s in sizes[:-1]:
        total += s
        offsets.append(total)
    parts = jnp.split(out, offsets, axis=0) if offsets else [out]
    outs = [
        p.reshape(leaf.shape[:-1] + (n_loc,))
        for p, leaf in zip(parts, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, outs)
