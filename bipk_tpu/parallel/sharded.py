"""Particle-sharded sweeps over a device mesh (shard_map + psum).

The particle axis shards over a 1-D mesh; per-particle work (physics RK4,
basis evaluation, per-particle MNIW factorization) is embarrassingly
parallel. Communication points and their collectives:

- weight normalization / ESS: ``pmax`` + ``psum`` (scalars),
- per-step weighted statistics / moment reductions: ``psum`` of local
  contraction partials (a few KB),
- resampling, selectable per build:

  * ``"local"`` (default): **local systematic resampling with global
    weight normalization** — each shard resamples its own slice from
    locally renormalized weights and carries the shard's global mass as a
    log-weight offset, so no particle payloads cross chips. This changes
    the resampling semantics vs the reference's global systematic
    ``searchsorted`` (``/root/reference/src/Filtering.py:28-35``) but
    keeps the estimator unbiased.
  * ``"exact"``: **exact global systematic resampling** — reproduces the
    reference's single-device scheme bit-for-bit on the mesh (shared
    stratification offset, global CDF, sorted global ancestors) and moves
    ancestor payloads between chips with a ring of ``ppermute`` rotations
    (see :mod:`bipk_tpu.parallel.global_resampling`). Costs one full
    payload rotation per step; use when statistical parity with the
    single-chip path matters more than ICI traffic.

Per-particle tensors are batch-last (lanes = particles, see
``bipk_tpu.algorithms.apf``). Traces reduce to weighted moments on the fly
(full ``(T, N, ...)`` traces of 1M-particle runs would not fit HBM); the
final particle population stays sharded for chaining.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bipk_tpu.algorithms.apf import APFKernel
from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import mniw, resampling
from bipk_tpu.parallel import global_resampling
from bipk_tpu.parallel.mesh import PARTICLE_AXIS


class ShardedAPFResult(NamedTuple):
    state_mean: jax.Array  # (T, dx) weighted posterior mean
    int_var_mean: tuple  # each (T, n_i)
    stats_mean: tuple  # each MNIW with leading (T, ...)
    ess: jax.Array  # (T,)
    final_state: jax.Array  # (N, dx) sharded over the mesh
    final_log_weights: jax.Array  # (N,) sharded
    final_stats: tuple  # each MNIW batch-last (..., N), sharded. Kept in
    # the compact lanes-last layout: (N, m, m) puts the m-sized dims into
    # the (8, 128) tile, a 6.4x HBM padding bloat (~13 GB at 1M particles)


def _global_softmax(lw):
    """Globally normalized weights from per-shard log-weight slices."""
    m = jax.lax.pmax(jnp.max(lw), PARTICLE_AXIS)
    e = jnp.exp(lw - m)
    z = jax.lax.psum(jnp.sum(e), PARTICLE_AXIS)
    return e / z


def build_sharded_apf(
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    mesh: Mesh,
    forgetting_factor: float = 1.0,
    dtype=jnp.float32,
    resampling_scheme: str = "local",
    chunk_size: int | None = None,
    window: int | None = None,
    blocked_carry: bool | None = None,
):
    """Build the particle-sharded online APF sweep.

    Returns ``run(key, observations, inputs, init_state_mean,
    init_state_cov) -> ShardedAPFResult``; semantics follow
    ``bipk_tpu.algorithms.apf`` (Algorithm 1) with the sharded resampling
    scheme described in the module docstring (``resampling_scheme`` is
    ``"local"`` or ``"exact"``).

    ``chunk_size`` microbatches the per-shard particle axis: the
    per-particle pipeline (factorization, auxiliary look-ahead, draws,
    statistics update) runs chunk by chunk so its temporaries never exceed
    one chunk, while the carry, weights, and resampling stay global. This
    caps HBM at ~2 full statistics copies + one chunk of temporaries —
    the difference between OOM and 1M particles on a single v5e chip.
    Auto-enabled above 262144 particles per shard (local scheme only).
    """
    if resampling_scheme not in ("local", "exact"):
        raise ValueError(
            f"resampling_scheme must be 'local' or 'exact', "
            f"got {resampling_scheme!r}"
        )
    from bipk_tpu.ops import pallas_kernels as _pk
    kern = APFKernel(ssm, gps, dtype)
    n_gp = kern.n_gp
    n_dev = mesh.devices.size
    if n_particles % n_dev:
        raise ValueError(
            f"n_particles={n_particles} not divisible by mesh size {n_dev}"
        )
    n_loc = n_particles // n_dev
    # chunk-size scan at 1M particles on v5e: 32k -> 3.35M psps,
    # 64k -> 3.28M, 128k -> 2.81M, 256k -> 2.09M (smaller chunks keep the
    # pipeline's working set closer to on-chip memory)
    if chunk_size is None and n_loc > 262144:
        chunk_size = 32768
    if chunk_size is not None and chunk_size >= n_loc:
        chunk_size = None
    if chunk_size is not None:
        if resampling_scheme != "local":
            raise ValueError(
                "chunked execution supports the local resampling scheme "
                "only (at multi-chip scale the per-shard slice is small "
                "enough not to need chunking)"
            )
        if n_loc % chunk_size:
            raise ValueError(
                f"per-shard particle count {n_loc} not divisible by "
                f"chunk_size {chunk_size}"
            )

    # BLOCKED statistics carry: ride the scan as (rows, nb, 128) — the
    # exact layout the fused kernels read and write — instead of
    # (rows, N). On TPU the 2-D<->blocked reshape is a PHYSICAL relayout
    # (different (8, 128) tiling), and the profiler shows XLA inserting
    # one ~40 us copy per 30 MB statistics matrix on BOTH sides of the
    # kernels every step (~150 us/step on the vehicle sweep). Blocked
    # carries need the tiled-layout kernels and the plain (non-chunked,
    # non-windowed, local-scheme) path.
    # Measured on the vehicle headline (round 5, v5e): blocked carry
    # cuts the dispatch-conditional overhead 591 -> 236 us/step, but the
    # XLA-fallback branch must relayout flat<->blocked in-branch
    # (~230 us/step at the 66% fallback rate) and the 2-axis weighted-
    # moment reduction lowers worse (+40 us/step): net 31.1 -> 27.7M
    # psps. Default OFF; kept as a bitwise-validated opt-in — a
    # blocked-native degenerate-weight gather (8-aligned dedup groups)
    # would flip the sign and is the natural next step.
    if blocked_carry is None:
        blocked_carry = False

    # SINGLE-DEVICE fast path: on a 1-device mesh the shard_map wrapper
    # and its singleton collectives are semantically free but not
    # cost-free — the separate-gather configuration measured 28.3M psps
    # sharded vs 30.1M unsharded on the vehicle headline (round-5
    # ledger, one v5e chip). With one device and the local scheme the
    # sweep body is called directly: ``axis_index`` pins to 0 (same RNG
    # fold-in as shard 0 of the mesh run) and psum/pmax are identities,
    # so results are bitwise-identical to the 1-device shard_map run
    # (guarded by tests/test_sharded.py). ``BIPK_FORCE_SHARDMAP=1``
    # restores the wrapper for A/B. The WINDOWED mode keeps shard_map
    # even at one device: its host loop re-dispatches the GB-scale
    # particle carry every <= ``window`` steps, and the shard_map output
    # shardings are what pin that carry to a stable on-device layout
    # between dispatches — bare jit measured 6.46M vs 8.66M psps on the
    # full-length 1M sweep (same-day A/B, one v5e).
    single = (
        n_dev == 1
        and resampling_scheme == "local"
        and window is None
        and not os.environ.get("BIPK_FORCE_SHARDMAP")
    )

    def axidx():
        return jnp.int32(0) if single else jax.lax.axis_index(PARTICLE_AXIS)

    def psum(x):
        return x if single else jax.lax.psum(x, PARTICLE_AXIS)

    def softmax_g(lw):
        if not single:
            return _global_softmax(lw)
        e = jnp.exp(lw - jnp.max(lw))
        return e / jnp.sum(e)
    blocked = bool(blocked_carry) and (
        chunk_size is None
        and window is None
        and resampling_scheme == "local"
        and n_loc % 1024 == 0
        and _pk.enabled()
        and all(
            _pk.supported(m_) and not _pk._cs_layout(m_)
            for m_ in kern.ms
        )
        and all(n_ <= 2 for n_ in kern.ns)
    )

    def pack_carry(st_tuple):
        packed = tuple(mniw.pack_stats_bl(st) for st in st_tuple)
        if blocked:
            packed = tuple(
                S.reshape(S.shape[0], -1, 128) for S in packed
            )
        return packed

    def flat_S(S):
        return S.reshape(S.shape[0], -1) if S.ndim == 3 else S

    def reduce_moments(w_global, state, int_vars, Ss):
        """Weighted moment reductions; ``Ss`` is the packed statistics
        carry (one (rows, N) or blocked (rows, nb, 128) matrix per GP)
        or structured MNIW tuples."""
        sm = psum(jnp.tensordot(state, w_global, axes=(-1, 0)))
        ivm = tuple(
            psum(jnp.tensordot(iv, w_global, axes=(-1, 0)))
            for iv in int_vars
        )
        if Ss and isinstance(Ss[0], jax.Array):
            stm = []
            for i, S in enumerate(Ss):
                if S.ndim == 3:
                    wb = w_global.reshape(S.shape[1], S.shape[2])
                    red = jnp.tensordot(S, wb, axes=((1, 2), (0, 1)))
                else:
                    red = jnp.tensordot(S, w_global, axes=(-1, 0))
                red = psum(red)
                stm.append(mniw.unpack_reduced(red, kern.ms[i], kern.ns[i]))
            stm = tuple(stm)
        else:
            stm = tuple(
                jax.tree_util.tree_map(
                    lambda s: psum(
                        jnp.tensordot(s, w_global, axes=(-1, 0))
                    ),
                    st,
                )
                for st in Ss
            )
        ess = 1.0 / psum(jnp.sum(w_global * w_global))
        return sm, ivm, stm, ess

    def step(carry, xs):
        shard = axidx()
        log_weights, state, int_vars, Ss = carry
        obs, inp_prev, inp_cur, key = xs  # key: shared across shards
        key_res, key_draws = jax.random.split(key)
        key_state, key_iv = jax.random.split(
            jax.random.fold_in(key_draws, shard)
        )

        aux_state, aux_iv, lw_aux, ll_aux, _, lws = (
            kern.auxiliary_fused_packed_f(
                Ss, forgetting_factor, state, int_vars, inp_prev,
                inp_cur, obs, log_weights,
                emit_factor=(resampling_scheme != "exact"
                             and kern.reuse_factor),
            )
        )

        w_global = softmax_g(lw_aux)
        if resampling_scheme == "exact":
            # exact global systematic resampling + ring payload fetch
            # (factors are recomputed from the redistributed statistics
            # — cheaper than rotating the factor payload over ICI)
            anc = global_resampling.global_systematic_slice(
                key_res, w_global, PARTICLE_AXIS, n_dev
            )
            state_r, iv_r, Ss_r, ll_aux_r = (
                global_resampling.ring_redistribute(
                    (state, int_vars, Ss, ll_aux),
                    anc, PARTICLE_AXIS, n_dev,
                )
            )
            offset = jnp.zeros((), dtype=ll_aux.dtype)
        else:
            # local systematic resampling on globally normalized mass;
            # small payloads gather through XLA, the packed statistics
            # gather is fused into the draw/update kernel below
            shard_mass = jnp.sum(w_global)
            w_local = w_global / jnp.maximum(shard_mass, 1e-30)
            ancestors = resampling.systematic(
                jax.random.fold_in(key_res, shard), w_local
            )
            state_r, iv_r, ll_aux_r = kern.packed_gather(
                (state, int_vars, ll_aux), ancestors
            )
            offset = jnp.log(jnp.maximum(shard_mass * n_dev, 1e-30))

        new_state = kern.propagate_all(key_state, state_r, inp_prev, iv_r)
        if resampling_scheme == "exact":
            # fused draw + rank-1 statistics update (ONE kernel per
            # GP) on the ring-redistributed statistics
            Ss_new, new_iv, new_basis, _ = kern.draw_update_all_packed(
                key_iv, Ss_r, forgetting_factor, new_state, inp_cur
            )
        else:
            # fused resampling gather + draw + rank-1 update: each
            # output particle's ancestor column is read inside the
            # kernel (sorted shard-local systematic ancestors), so the
            # gathered statistics never exist in HBM
            Ss_new, new_iv, new_basis, _ = (
                kern.draw_update_gather_all_packed(
                    key_iv, Ss, ancestors, forgetting_factor,
                    new_state, inp_cur, factors=lws,
                )
            )

        ll_new = kern.log_lik_all(obs, new_state, inp_cur, new_iv)
        new_log_weights = ll_new - ll_aux_r + offset

        w_new = softmax_g(new_log_weights)
        moments = reduce_moments(w_new, new_state, new_iv, Ss_new)
        return (new_log_weights, new_state, new_iv, Ss_new), moments

    def step_chunked(carry, xs):
        """Microbatched step: identical semantics to ``step`` (local
        scheme) with per-particle temporaries capped at one chunk.
        Statistics ride the carry packed (one (rows, N) matrix per
        GP)."""
        shard = axidx()
        log_weights, state, int_vars, Ss = carry
        obs, inp_prev, inp_cur, key = xs
        key_res, key_draws = jax.random.split(key)
        key_base = jax.random.fold_in(key_draws, shard)
        n_chunks = n_loc // chunk_size

        def sl(tree, c):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(
                    a, c * chunk_size, chunk_size, axis=-1
                ),
                tree,
            )

        def st_chunk(buf, val, c):
            return jax.tree_util.tree_map(
                lambda b, v: jax.lax.dynamic_update_slice_in_dim(
                    b, v, c * chunk_size, axis=-1
                ),
                buf,
                val,
            )

        # phase 1: auxiliary log-likelihoods, chunk by chunk (the
        # factors are recomputed in phase 2; keeping them for every
        # chunk would defeat the memory cap)
        def p1_body(c, ll_buf):
            state_c, iv_c, Ss_c = sl((state, int_vars, Ss), c)
            _, _, _, ll_aux_c, _ = kern.auxiliary_fused_packed(
                Ss_c, forgetting_factor, state_c, iv_c, inp_prev,
                inp_cur, obs, jnp.zeros((chunk_size,), dtype),
            )
            return jax.lax.dynamic_update_slice_in_dim(
                ll_buf, ll_aux_c, c * chunk_size, axis=0
            )

        ll_aux = jax.lax.fori_loop(
            0, n_chunks, p1_body, jnp.zeros((n_loc,), dtype)
        )
        lw_aux = ll_aux + log_weights

        w_global = softmax_g(lw_aux)
        shard_mass = jnp.sum(w_global)
        w_local = w_global / jnp.maximum(shard_mass, 1e-30)
        ancestors = resampling.systematic(
            jax.random.fold_in(key_res, shard), w_local
        )
        offset = jnp.log(jnp.maximum(shard_mass * n_dev, 1e-30))

        # phase 2: gather + propagate + fused draw/update, chunk by
        # chunk; outputs stream into full-size buffers (the new carry)
        zeros_like_full = jax.tree_util.tree_map(
            jnp.zeros_like, (state, int_vars, Ss)
        )
        ll_new0 = jnp.zeros((n_loc,), dtype)

        def p2_body(c, bufs):
            new_state_b, new_iv_b, new_Ss_b, ll_new_b = bufs
            idx_c = jax.lax.dynamic_slice_in_dim(
                ancestors, c * chunk_size, chunk_size, axis=0
            )
            state_g, iv_g, ll_aux_g = kern.gather(
                (state, int_vars, ll_aux), idx_c
            )
            kc = jax.random.fold_in(key_base, c)
            kc_state, kc_iv = jax.random.split(kc)
            new_state_c = kern.propagate_all(
                kc_state, state_g, inp_prev, iv_g
            )
            # fused gather+draw/update: the chunk's statistics columns
            # are read from the FULL population inside the kernel
            # (N_out = chunk < N_in = n_loc)
            # unconditional separate-gather path: a lax.cond per chunk
            # costs ~2.4 ms of dispatch overhead + GB-scale boundary
            # copies (profiled: 133 of the 230 ms/step at 1M particles)
            new_Ss_c, new_iv_c, _, _ = (
                kern.draw_update_gather_all_packed(
                    kc_iv, Ss, idx_c, forgetting_factor,
                    new_state_c, inp_cur, fused=False,
                )
            )
            ll_new_c = kern.log_lik_all(
                obs, new_state_c, inp_cur, new_iv_c
            )
            lw_c = ll_new_c - ll_aux_g + offset
            return (
                st_chunk(new_state_b, new_state_c, c),
                st_chunk(new_iv_b, new_iv_c, c),
                st_chunk(new_Ss_b, new_Ss_c, c),
                jax.lax.dynamic_update_slice_in_dim(
                    ll_new_b, lw_c, c * chunk_size, axis=0
                ),
            )

        new_state, new_iv, new_Ss, new_log_weights = (
            jax.lax.fori_loop(
                0,
                n_chunks,
                p2_body,
                (*zeros_like_full, ll_new0),
            )
        )

        w_new = softmax_g(new_log_weights)
        moments = reduce_moments(w_new, new_state, new_iv, new_Ss)
        return (new_log_weights, new_state, new_iv, new_Ss), moments


    def sweep(key, observations, inputs, init_mean, init_cov):
        """Per-shard body (runs under shard_map).

        Key discipline: per-step keys in the scan are **shared** across
        shards (the exact scheme needs an identical stratification offset
        everywhere); anything drawing shard-local randomness folds in the
        shard index first.
        """
        shard = axidx()

        key, key_init = jax.random.split(key)
        log_weights, state, int_vars, stats = kern.init_particles(
            jax.random.fold_in(key_init, shard), n_loc,
            inputs[0], init_mean, init_cov,
        )

        n_steps = observations.shape[0]
        keys = jax.random.split(key, n_steps - 1)
        xs = (observations[1:], inputs[:-1], inputs[1:], keys)
        # statistics ride the scan packed: one (rows, N) matrix per GP
        # (see bipk_tpu.algorithms.apf)
        carry0 = (
            log_weights, state, int_vars,
            pack_carry(stats),
        )
        step_fn = step if chunk_size is None else step_chunked
        carry, (sm, ivm, stm, ess) = jax.lax.scan(step_fn, carry0, xs)
        final_log_w, final_state, _, final_Ss = carry
        final_stats = tuple(
            mniw.from_flat_bl(
                mniw.unpack_stats_bl(flat_S(S), kern.ms[i], kern.ns[i]),
                kern.ms[i], kern.ns[i],
            )
            for i, S in enumerate(final_Ss)
        )

        w0 = softmax_g(log_weights)
        sm0, ivm0, stm0, ess0 = reduce_moments(w0, state, int_vars, stats)
        state_mean = jnp.concatenate([sm0[None], sm])
        iv_mean = tuple(
            jnp.concatenate([ivm0[i][None], ivm[i]]) for i in range(n_gp)
        )
        stats_mean = tuple(
            jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a[None], b]), stm0[i], stm[i]
            )
            for i in range(n_gp)
        )
        ess_tr = jnp.concatenate([ess0[None], ess])
        return (
            state_mean,
            iv_mean,
            stats_mean,
            ess_tr,
            final_state.T,
            final_log_w,
            tuple(final_stats),
        )

    # final stats are batch-last: particle axis is the LAST dim of the
    # 3-D leaves (and the only dim of T3)
    stats_spec = tuple(
        mniw.MNIW(
            P(None, None, PARTICLE_AXIS),
            P(None, None, PARTICLE_AXIS),
            P(None, None, PARTICLE_AXIS),
            P(PARTICLE_AXIS),
        )
        for _ in range(n_gp)
    )
    iv_spec = tuple(P() for _ in range(n_gp))
    stats_mean_spec = tuple(mniw.MNIW(P(), P(), P(), P()) for _ in range(n_gp))
    sharded = sweep if single else shard_map(
        sweep,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(
            P(),
            iv_spec,
            stats_mean_spec,
            P(),
            P(PARTICLE_AXIS),
            P(PARTICLE_AXIS),
            stats_spec,
        ),
        check_vma=False,
    )

    def run(key, observations, inputs, init_state_mean, init_state_cov):
        observations = jnp.atleast_2d(
            jnp.asarray(observations, dtype=dtype).T
        ).T
        inputs = jnp.asarray(inputs, dtype=dtype)
        out = sharded(
            key,
            observations,
            inputs,
            jnp.asarray(init_state_mean, dtype=dtype),
            jnp.asarray(jnp.atleast_2d(init_state_cov), dtype=dtype),
        )
        return ShardedAPFResult(*out)

    if window is None:
        return run

    # --- windowed dispatch -------------------------------------------
    # The sweep is segmented into <= ``window``-step shard_map dispatches
    # with the (sharded, on-device) particle carry passed between them, so
    # arbitrarily long sweeps never exceed one dispatch's RPC deadline /
    # compile budget — this is how the 1M-particle mode runs FULL
    # sequences end-to-end. RNG discipline matches the single-dispatch
    # path exactly (same key split + per-step key table), so results are
    # identical up to reduction rounding.
    import numpy as np

    carry_spec = (
        P(PARTICLE_AXIS),
        P(None, PARTICLE_AXIS),
        tuple(P(None, PARTICLE_AXIS) for _ in range(n_gp)),
        tuple(P(None, PARTICLE_AXIS) for _ in range(n_gp)),
    )
    moments_spec = (P(), iv_spec, stats_mean_spec, P())

    def init_shard(key_init, inputs0, init_mean, init_cov):
        shard = axidx()
        log_weights, state, int_vars, stats = kern.init_particles(
            jax.random.fold_in(key_init, shard), n_loc,
            inputs0, init_mean, init_cov,
        )
        w0 = softmax_g(log_weights)
        m0 = reduce_moments(w0, state, int_vars, stats)
        carry = (
            log_weights, state, int_vars,
            tuple(mniw.pack_stats_bl(st) for st in stats),
        )
        return carry, m0

    init_sharded = jax.jit(shard_map(
        init_shard, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(carry_spec, moments_spec), check_vma=False,
    ))

    _step_fn = step if chunk_size is None else step_chunked

    def window_shard(carry, obs_w, inp_prev_w, inp_cur_w, keys_w):
        return jax.lax.scan(
            _step_fn, carry, (obs_w, inp_prev_w, inp_cur_w, keys_w)
        )

    window_sharded = jax.jit(shard_map(
        window_shard, mesh=mesh,
        in_specs=(carry_spec, P(), P(), P(), P()),
        out_specs=(carry_spec, moments_spec),
        check_vma=False,
    ))

    def finalize_shard(carry):
        final_log_w, final_state, _, final_Ss = carry
        final_stats = tuple(
            mniw.from_flat_bl(
                mniw.unpack_stats_bl(S, kern.ms[i], kern.ns[i]),
                kern.ms[i], kern.ns[i],
            )
            for i, S in enumerate(final_Ss)
        )
        return final_state.T, final_log_w, tuple(final_stats)

    finalize_sharded = jax.jit(shard_map(
        finalize_shard, mesh=mesh, in_specs=(carry_spec,),
        out_specs=(P(PARTICLE_AXIS), P(PARTICLE_AXIS), stats_spec),
        check_vma=False,
    ))

    def run_windowed(
        key, observations, inputs, init_state_mean, init_state_cov
    ):
        observations = jnp.atleast_2d(
            jnp.asarray(observations, dtype=dtype).T
        ).T
        inputs = jnp.asarray(inputs, dtype=dtype)
        T = observations.shape[0]
        key, key_init = jax.random.split(key)
        keys = jax.random.split(key, T - 1)
        carry, m0 = init_sharded(
            key_init, inputs[0],
            jnp.asarray(init_state_mean, dtype=dtype),
            jnp.asarray(jnp.atleast_2d(init_state_cov), dtype=dtype),
        )
        host = functools.partial(jax.tree_util.tree_map, np.asarray)
        pieces = [jax.tree_util.tree_map(lambda a: np.asarray(a)[None], m0)]
        for s in range(0, T - 1, window):
            e = min(s + window, T - 1)
            carry, mw = window_sharded(
                carry,
                observations[1 + s : 1 + e],
                inputs[s:e],
                inputs[s + 1 : e + 1],
                keys[s:e],
            )
            pieces.append(host(mw))
        final_state_t, final_log_w, final_stats = finalize_sharded(carry)
        sm, ivm, stm, ess = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs), *pieces
        )
        return ShardedAPFResult(
            sm, ivm, stm, ess, final_state_t, final_log_w, final_stats
        )

    return run_windowed
