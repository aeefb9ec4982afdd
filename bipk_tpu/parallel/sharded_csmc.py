"""Particle-sharded conditional SMC (Algorithm 3) over a device mesh.

The shard_map production path for multi-chip PGAS, complementing the GSPMD
``mesh=`` option on :func:`bipk_tpu.algorithms.csmc.build_csmc`: the sweep
body runs per shard (so the fused Pallas kernels dispatch normally —
GSPMD cannot partition ``pallas_call``), with hand-placed collectives at
the algorithm's genuine communication points:

- weight normalization / ESS: ``pmax`` + ``psum`` scalars,
- resampling: the **exact** global systematic scheme of
  :mod:`bipk_tpu.parallel.global_resampling` (closed-form offspring counts
  from an all-gather of per-shard masses, ring ``ppermute`` payload
  redistribution) — conditional SMC pins the last particle to the
  reference trajectory, and the pinned slot must be able to adopt ANY
  global ancestor, so the local-resampling shortcut of
  :mod:`bipk_tpu.parallel.sharded` does not apply,
- the reference particle's ancestor draw: a global categorical
  (:func:`bipk_tpu.parallel.global_resampling.global_categorical`).

The reference particle occupies the last lane of the LAST shard (global
index ``N-1``); its pinning, statistics surgery, and the replicated
ref-future statistics decrement follow ``bipk_tpu.algorithms.csmc``
(behavioral parity: ``/root/reference/src/Algorithm3.py``, including the
corrected ancestor-sampling weights — see ``tests/test_invariance.py``).

Backward ancestral reconstruction runs AFTER the shard_map on the emitted
(sharded) global traces; XLA inserts the tiny per-step cross-shard gathers.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from bipk_tpu.algorithms.apf import APFKernel
from bipk_tpu.algorithms.csmc import CSMCResult
from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import batched_linalg as bla
from bipk_tpu.ops import mniw, resampling
from bipk_tpu.parallel import global_resampling as gr
from bipk_tpu.parallel.mesh import PARTICLE_AXIS
from bipk_tpu.parallel.sharded import _global_softmax


def build_sharded_csmc(
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    mesh: Mesh,
    dtype=jnp.float32,
    chunk_size: int | None = None,
) -> Callable:
    """Build the particle-sharded cSMC-with-ancestor-sampling sweep.

    Same call signature and :class:`CSMCResult` contract as
    ``bipk_tpu.algorithms.csmc.build_csmc``:
    ``run(key, observations, inputs, init_state_mean, init_state_cov,
    ref_state, ref_int_vars, ref_summed_stats)``.

    ``chunk_size`` microbatches the per-shard particle axis the way
    :func:`bipk_tpu.parallel.sharded.build_sharded_apf` does: the
    auxiliary/ancestor-weight pass and the propagate+draw/update pass run
    chunk by chunk (per-particle temporaries capped at one chunk), while
    the global collectives — exact systematic resampling, the distributed
    ancestor categorical, and the ring redistribute — still see the full
    shard. Defaults on automatically above 256k particles per shard.
    """
    kern = APFKernel(ssm, gps, dtype)
    n_gp = kern.n_gp
    ms, ns = kern.ms, kern.ns
    n_dev = mesh.devices.size
    if n_particles % n_dev:
        raise ValueError(
            f"n_particles={n_particles} not divisible by mesh size {n_dev}"
        )
    n_loc = n_particles // n_dev
    if chunk_size is None and n_loc > 262144:
        chunk_size = 32768
    if chunk_size is not None and chunk_size >= n_loc:
        chunk_size = None
    if chunk_size is not None and n_loc % chunk_size:
        raise ValueError(
            f"per-shard particle count {n_loc} not divisible by "
            f"chunk_size {chunk_size}"
        )

    deterministic = ssm.is_deterministic
    process_chol = kern.process_chol
    if process_chol is not None:
        _q_logdet = jnp.sum(jnp.log(jnp.diagonal(process_chol)))

    def ref_contribution(ref_state_t, ref_iv_t, inp_t):
        """Rank-1 statistics of the reference at one time point (small,
        replicated — identical on every shard)."""
        out = []
        for i in range(n_gp):
            phi = kern.gps[i].basis_fn(ref_state_t, inp_t)
            y = jnp.atleast_1d(ref_iv_t[i])
            out.append(
                mniw.MNIW(
                    jnp.outer(phi, y),
                    jnp.outer(phi, phi),
                    jnp.outer(y, y),
                    jnp.asarray(1.0, dtype=dtype),
                )
            )
        return tuple(out)

    def transition_logpdf_to_ref(aux_state, ref_x, lw_like):
        """``h_x``: Gaussian transition density from each auxiliary state
        to the reference state (``Algorithm3.py:107-114``)."""
        if deterministic:
            return jnp.zeros_like(lw_like)
        resid = aux_state - ref_x[:, None]
        white = bla.solve_lower_bl(process_chol, resid)
        dx = white.shape[0]
        return (
            -0.5
            * (dx * jnp.log(2.0 * jnp.asarray(jnp.pi, dtype))
               + jnp.sum(white * white, axis=0))
            - _q_logdet
        )

    def _pin_lane(arr, value, is_last_shard):
        """Write ``value`` into the last lane, on the last shard only."""
        return arr.at[..., -1].set(
            jnp.where(is_last_shard, value, arr[..., -1])
        )

    def _repin_last_column(S_new, phi_last, y_drawn, y_ref, m, n, is_last):
        """Swap the drawn interface variable's rank-1 contribution for the
        pinned reference's in the last statistics column, on the last shard
        (parity: ``Algorithm3.py:147-174``; T1's phi term is identical)."""
        o1 = m * n
        o2 = o1 + m * (m + 1) // 2
        o3 = o2 + n * (n + 1) // 2
        d0 = (phi_last[:, None] * (y_ref - y_drawn)[None, :]).reshape(-1)
        d2 = mniw.sym_to_tri_rows(
            (
                jnp.outer(y_ref, y_ref) - jnp.outer(y_drawn, y_drawn)
            ).reshape(-1),
            n,
        )
        col = S_new[:, -1]
        col = col.at[:o1].add(d0).at[o2:o3].add(d2)
        return S_new.at[:, -1].set(jnp.where(is_last, col, S_new[:, -1]))

    def sweep(
        key, observations, inputs, init_mean, init_cov,
        ref_state, ref_int_vars, ref_summed_stats,
    ):
        """Per-shard body. Key discipline mirrors
        ``bipk_tpu.parallel.sharded``: per-step keys are shared across
        shards (the exact resampler and the global categorical need
        identical draws everywhere); shard-local randomness folds in the
        shard index."""
        shard = jax.lax.axis_index(PARTICLE_AXIS)
        is_last = shard == n_dev - 1

        key, key_init = jax.random.split(key)
        log_w0, state0, iv0, stats0 = kern.init_particles(
            jax.random.fold_in(key_init, shard), n_loc,
            inputs[0], init_mean, init_cov,
        )

        # pin the last particle (globally: index N-1, the last lane of the
        # last shard) to the reference at t=0
        # (parity: /root/reference/src/Algorithm3.py:220-232)
        state0 = _pin_lane(state0, ref_state[0], is_last)
        iv0 = tuple(
            _pin_lane(iv0[i], jnp.atleast_1d(ref_int_vars[i][0]), is_last)
            for i in range(n_gp)
        )
        ref_T0 = ref_contribution(
            ref_state[0], tuple(r[0] for r in ref_int_vars), inputs[0]
        )
        stats0 = tuple(
            mniw.MNIW(
                _pin_lane(stats0[i].T0, ref_T0[i].T0, is_last),
                _pin_lane(stats0[i].T1, ref_T0[i].T1, is_last),
                _pin_lane(stats0[i].T2, ref_T0[i].T2, is_last),
                _pin_lane(stats0[i].T3, ref_T0[i].T3, is_last),
            )
            for i in range(n_gp)
        )
        # the reference's remaining-future statistics exclude t=0 —
        # replicated on every shard (parity: Algorithm3.py:234-246)
        ref_stats0 = tuple(
            jax.tree_util.tree_map(
                lambda s, t: jnp.asarray(s, dtype=dtype) - t,
                ref_summed_stats[i],
                ref_T0[i],
            )
            for i in range(n_gp)
        )

        def _g_diff(Ss_c, fps_c, ref_stats, zeros):
            """``g_t - g_T`` marginal-likelihood correction from MNIW log
            base measures (parity: Algorithm3.py:92-106); the AS weights
            use the time-(t-1) importance weights, NOT the auxiliary
            weights (deliberate fix, verified vs Kalman/RTS — see
            bipk_tpu.algorithms.csmc and tests/test_invariance.py)."""
            g = zeros
            for i in range(n_gp):
                prior_eff = mniw.MNIW(
                    kern.priors[i].T0 + ref_stats[i].T0,
                    kern.priors[i].T1 + ref_stats[i].T1,
                    kern.priors[i].T2 + ref_stats[i].T2,
                    kern.priors[i].T3 + ref_stats[i].T3,
                )
                with_future = mniw.log_base_measure_packed_bl(
                    Ss_c[i], prior_eff, ms[i], ns[i],
                    use_pallas=kern.use_pallas,
                )
                without_future = mniw.log_base_measure_from_projected_bl(
                    fps_c[i], ms[i]
                )
                g = g + without_future - with_future
            return g

        def step(carry, xs):
            log_weights, state, int_vars, Ss, ref_stats = carry
            obs, inp_prev, inp_cur, ref_x, ref_iv, key = xs
            key_res, key_ref, key_draws = jax.random.split(key, 3)
            key_state, key_iv = jax.random.split(
                jax.random.fold_in(key_draws, shard)
            )

            aux_state, aux_iv, lw_aux, ll_aux, fps = (
                kern.auxiliary_fused_packed(
                    Ss, 1.0, state, int_vars, inp_prev, inp_cur, obs,
                    log_weights,
                )
            )

            w_global = _global_softmax(lw_aux)
            anc = gr.global_systematic_slice(
                key_res, w_global, PARTICLE_AXIS, n_dev
            )

            # --- ancestor sampling for the reference particle ---
            g_diff = _g_diff(Ss, fps, ref_stats, jnp.zeros_like(lw_aux))
            h_x = transition_logpdf_to_ref(aux_state, ref_x, lw_aux)
            w_as = _global_softmax(log_weights + g_diff + h_x)
            ref_idx = gr.global_categorical(
                key_ref, w_as, PARTICLE_AXIS, n_dev
            )
            # the pinned output slot is global index N-1: the last lane of
            # the last shard adopts the AS-drawn global ancestor
            anc = jnp.where(is_last, anc.at[-1].set(ref_idx), anc)

            # cross-shard payload redistribution (exact global ancestors)
            state_r, iv_r, Ss_r, ll_aux_r = gr.ring_redistribute(
                (state, int_vars, Ss, ll_aux), anc, PARTICLE_AXIS, n_dev
            )

            new_state = kern.propagate_all(
                key_state, state_r, inp_prev, iv_r
            )
            new_state = _pin_lane(new_state, ref_x, is_last)

            # fused draw + rank-1 statistics update; then swap the drawn
            # contribution for the pinned reference's in the last column
            Ss_new, new_iv, new_basis, _ = kern.draw_update_all_packed(
                key_iv, Ss_r, 1.0, new_state, inp_cur
            )
            pinned_iv = tuple(
                jnp.atleast_1d(ref_iv[i]).astype(dtype) for i in range(n_gp)
            )
            Ss_new = tuple(
                _repin_last_column(
                    Ss_new[i], new_basis[i][:, -1], new_iv[i][:, -1],
                    pinned_iv[i], ms[i], ns[i], is_last,
                )
                for i in range(n_gp)
            )
            new_iv = tuple(
                _pin_lane(new_iv[i], pinned_iv[i], is_last)
                for i in range(n_gp)
            )
            ll_new = kern.log_lik_all(obs, new_state, inp_cur, new_iv)
            new_log_weights = ll_new - ll_aux_r

            ref_T = ref_contribution(ref_x, ref_iv, inp_cur)
            new_ref_stats = tuple(
                jax.tree_util.tree_map(
                    lambda s, t: s - t, ref_stats[i], ref_T[i]
                )
                for i in range(n_gp)
            )

            w_new = _global_softmax(new_log_weights)
            ess = 1.0 / jax.lax.psum(
                jnp.sum(w_new * w_new), PARTICLE_AXIS
            )
            emits = (new_state, tuple(new_iv), anc, ess)
            return (
                new_log_weights, new_state, new_iv, Ss_new, new_ref_stats
            ), emits

        def step_chunked(carry, xs):
            """Microbatched step: identical semantics to ``step`` with
            per-particle temporaries capped at one chunk (a different but
            equally valid RNG stream for the shard-local draws). The
            collectives — exact resampling, distributed AS categorical,
            ring redistribute — still act on the full shard."""
            log_weights, state, int_vars, Ss, ref_stats = carry
            obs, inp_prev, inp_cur, ref_x, ref_iv, key = xs
            key_res, key_ref, key_draws = jax.random.split(key, 3)
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

            # phase 1: auxiliary log-likelihoods + AS weight pieces
            # (g_t - g_T and h_x are per-particle scalars; the factors and
            # auxiliary states never exist beyond one chunk)
            zeros_c = jnp.zeros((chunk_size,), dtype)

            def p1_body(c, bufs):
                ll_buf, g_buf, h_buf = bufs
                state_c, iv_c, Ss_c = sl((state, int_vars, Ss), c)
                aux_state_c, _, _, ll_aux_c, fps_c = (
                    kern.auxiliary_fused_packed(
                        Ss_c, 1.0, state_c, iv_c, inp_prev, inp_cur, obs,
                        zeros_c,
                    )
                )
                g_c = _g_diff(Ss_c, fps_c, ref_stats, zeros_c)
                h_c = transition_logpdf_to_ref(aux_state_c, ref_x, zeros_c)
                return (
                    st_chunk(ll_buf, ll_aux_c, c),
                    st_chunk(g_buf, g_c, c),
                    st_chunk(h_buf, h_c, c),
                )

            zeros_loc = jnp.zeros((n_loc,), dtype)
            ll_aux, g_diff, h_x = jax.lax.fori_loop(
                0, n_chunks, p1_body, (zeros_loc, zeros_loc, zeros_loc)
            )
            lw_aux = ll_aux + log_weights

            w_global = _global_softmax(lw_aux)
            anc = gr.global_systematic_slice(
                key_res, w_global, PARTICLE_AXIS, n_dev
            )
            w_as = _global_softmax(log_weights + g_diff + h_x)
            ref_idx = gr.global_categorical(
                key_ref, w_as, PARTICLE_AXIS, n_dev
            )
            anc = jnp.where(is_last, anc.at[-1].set(ref_idx), anc)

            state_r, iv_r, Ss_r, ll_aux_r = gr.ring_redistribute(
                (state, int_vars, Ss, ll_aux), anc, PARTICLE_AXIS, n_dev
            )

            # phase 2: propagate + fused draw/update + pinning, chunk by
            # chunk; outputs stream into full-size buffers (the new carry)
            pinned_iv = tuple(
                jnp.atleast_1d(ref_iv[i]).astype(dtype) for i in range(n_gp)
            )
            zeros_like_full = jax.tree_util.tree_map(
                jnp.zeros_like, (state, int_vars, Ss)
            )

            def p2_body(c, bufs):
                new_state_b, new_iv_b, new_Ss_b, lw_b = bufs
                # the pinned slot is the LAST lane of the last chunk of
                # the last shard (global index N-1)
                pin_here = jnp.logical_and(is_last, c == n_chunks - 1)
                state_c, iv_c, Ss_c, ll_aux_c = sl(
                    (state_r, iv_r, Ss_r, ll_aux_r), c
                )
                kc_state, kc_iv = jax.random.split(
                    jax.random.fold_in(key_base, c)
                )
                new_state_c = kern.propagate_all(
                    kc_state, state_c, inp_prev, iv_c
                )
                new_state_c = _pin_lane(new_state_c, ref_x, pin_here)
                Ss_new_c, new_iv_c, new_basis_c, _ = (
                    kern.draw_update_all_packed(
                        kc_iv, Ss_c, 1.0, new_state_c, inp_cur
                    )
                )
                Ss_new_c = tuple(
                    _repin_last_column(
                        Ss_new_c[i], new_basis_c[i][:, -1],
                        new_iv_c[i][:, -1], pinned_iv[i], ms[i], ns[i],
                        pin_here,
                    )
                    for i in range(n_gp)
                )
                new_iv_c = tuple(
                    _pin_lane(new_iv_c[i], pinned_iv[i], pin_here)
                    for i in range(n_gp)
                )
                ll_new_c = kern.log_lik_all(
                    obs, new_state_c, inp_cur, new_iv_c
                )
                lw_c = ll_new_c - ll_aux_c
                return (
                    st_chunk(new_state_b, new_state_c, c),
                    st_chunk(new_iv_b, new_iv_c, c),
                    st_chunk(new_Ss_b, Ss_new_c, c),
                    st_chunk(lw_b, lw_c, c),
                )

            new_state, new_iv, Ss_new, new_log_weights = jax.lax.fori_loop(
                0, n_chunks, p2_body, (*zeros_like_full, zeros_loc)
            )

            ref_T = ref_contribution(ref_x, ref_iv, inp_cur)
            new_ref_stats = tuple(
                jax.tree_util.tree_map(
                    lambda s, t: s - t, ref_stats[i], ref_T[i]
                )
                for i in range(n_gp)
            )

            w_new = _global_softmax(new_log_weights)
            ess = 1.0 / jax.lax.psum(
                jnp.sum(w_new * w_new), PARTICLE_AXIS
            )
            emits = (new_state, tuple(new_iv), anc, ess)
            return (
                new_log_weights, new_state, new_iv, Ss_new, new_ref_stats
            ), emits

        n_steps = observations.shape[0]
        keys = jax.random.split(key, n_steps)
        xs = (
            observations[1:],
            inputs[:-1],
            inputs[1:],
            ref_state[1:],
            tuple(r[1:] for r in ref_int_vars),
            keys[:-1],
        )
        carry0 = (
            log_w0, state0, iv0,
            tuple(mniw.pack_stats_bl(st) for st in stats0),
            ref_stats0,
        )
        step_fn = step if chunk_size is None else step_chunked
        carry, (state_tr, iv_tr, ancestors, ess) = jax.lax.scan(
            step_fn, carry0, xs
        )
        final_log_w = carry[0]
        return state0, iv0, state_tr, iv_tr, ancestors, ess, final_log_w

    iv_spec = tuple(P(None, PARTICLE_AXIS) for _ in range(n_gp))
    iv_tr_spec = tuple(P(None, None, PARTICLE_AXIS) for _ in range(n_gp))
    sharded = shard_map(
        sweep,
        mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(
            P(None, PARTICLE_AXIS),  # state0 (dx, N)
            iv_spec,  # iv0
            P(None, None, PARTICLE_AXIS),  # state trace (T-1, dx, N)
            iv_tr_spec,  # iv traces
            P(None, PARTICLE_AXIS),  # ancestors (T-1, N) global indices
            P(),  # ess (T-1,) replicated
            P(PARTICLE_AXIS),  # final log weights (N,)
        ),
        check_vma=False,
    )

    def run(
        key,
        observations,
        inputs,
        init_state_mean,
        init_state_cov,
        ref_state,
        ref_int_vars,
        ref_summed_stats,
    ):
        observations = jnp.atleast_2d(
            jnp.asarray(observations, dtype=dtype).T
        ).T
        inputs = jnp.asarray(inputs, dtype=dtype)
        ref_state = jnp.asarray(ref_state, dtype=dtype)
        ref_int_vars = tuple(
            jnp.atleast_2d(jnp.asarray(r, dtype=dtype).T).T
            for r in ref_int_vars
        )
        key, key_final = jax.random.split(key)
        (
            state0, iv0, state_tr, iv_tr, ancestors, ess, final_log_w
        ) = sharded(
            key,
            observations,
            inputs,
            jnp.asarray(init_state_mean, dtype=dtype),
            jnp.asarray(jnp.atleast_2d(init_state_cov), dtype=dtype),
            ref_state,
            ref_int_vars,
            tuple(
                jax.tree_util.tree_map(
                    lambda s: jnp.asarray(s, dtype=dtype), st
                )
                for st in ref_summed_stats
            ),
        )

        states = jnp.concatenate([state0[None], state_tr])
        int_vars = tuple(
            jnp.concatenate([iv0[i][None], iv_tr[i]]) for i in range(n_gp)
        )

        # backward ancestral trajectory draw on the (sharded) global
        # traces — the per-step single-particle gathers cross shards; XLA
        # inserts the (tiny) collectives
        idx = resampling.categorical_from_weights(
            key_final, jax.nn.softmax(final_log_w)
        )
        (state_traj, iv_traj), _ = resampling.reconstruct_trajectory_bl(
            (states, int_vars), ancestors, idx
        )
        return CSMCResult(
            state_traj=state_traj,
            int_var_traj=iv_traj,
            ess=ess,
            log_weights=final_log_w,
        )

    return run
