"""Algorithm 3 — conditional SMC with ancestor sampling, marginalized GP.

The cSMC kernel inside PGAS (Algorithm 2): an APF sweep in which the last
particle is pinned to the reference trajectory, the reference's ancestor is
resampled with parameter-marginalized ancestor weights built from MNIW log
base measures, and the reference's own future sufficient statistics are
decremented step by step.

Behavioral parity: ``Algorithm3`` (``/root/reference/src/Algorithm3.py``),
with the time loop fused into one ``lax.scan``, per-particle tensors in
batch-last layout (see ``bipk_tpu.algorithms.apf``), and the backward
ancestral reconstruction (host numpy in the reference,
``/root/reference/src/Filtering.py:40-55``) as a reverse scan on device.

Architectural delta (TPU-first): the default (direct) formulation runs the
factorization-class work as fused Pallas kernels whose factors never touch
HBM (``mniw.factorize_project_bl``), with one packed resampling gather per
step. Because Algorithm 3 pins the forgetting factor to 1.0
(``Algorithm3.py:29-41``), each particle's ``prior + stats`` also evolves
purely by rank-1 data updates and the reference-future bookkeeping purely
by rank-1 decrements; the opt-in ``rank1=True`` path carries **augmented
Cholesky factors** (:mod:`bipk_tpu.ops.cholup`) through the scan and
maintains them in O(p^2) per step. The rank-1 path is exact (verified
bitwise vs the direct path on f64, ``tests/test_cholup.py``) but its
unrolled XLA lowering currently runs on 1-sublane vectors and measures
slower than the fused direct path on v5e — it becomes the default once it
gets its own fused update kernel.

Deviation: for deterministic transitions (zero process noise — the toy
example) the reference evaluates a Gaussian transition density with singular
covariance, which produces NaN ancestor weights that degenerate into "keep
own ancestry" after index clamping (``Algorithm3.py:107-125``). Here the
transition term ``h_x`` is dropped in that case, leaving the well-defined
marginal-likelihood ancestor weights.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from bipk_tpu.algorithms.apf import APFKernel
from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import batched_linalg as bla
from bipk_tpu.ops import cholup, mniw, resampling


class CSMCResult(NamedTuple):
    state_traj: jax.Array  # (T, dx)
    int_var_traj: tuple  # each (T, n_i)
    ess: jax.Array  # (T-1,)
    log_weights: jax.Array  # (N,) final


def build_csmc(
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    dtype=jnp.float32,
    mesh=None,
    rank1: bool | None = None,
) -> Callable:
    """Build the fused conditional-SMC-with-ancestor-sampling sweep.

    Returns ``run(key, observations, inputs, init_state_mean,
    init_state_cov, ref_state, ref_int_vars, ref_summed_stats) ->
    CSMCResult`` where ``ref_state (T, dx)``, ``ref_int_vars`` is a tuple of
    ``(T, n_i)`` trajectories and ``ref_summed_stats`` the tuple of summed
    MNIW statistics of the reference trajectory. ``rank1=True`` opts into
    the O(p^2)-per-step factor-carry formulation; the default is the fused
    refactorize-per-step path, which measures faster on v5e (see module
    docstring).
    """
    kern = APFKernel(ssm, gps, dtype, mesh=mesh)
    n_gp = kern.n_gp
    ms = tuple(gp.prior.T1.shape[0] for gp in kern.gps)
    ns = tuple(gp.prior.T2.shape[0] for gp in kern.gps)

    if rank1 is None:
        # Opt-in for now: the O(p^2) math wins on paper, but the unrolled
        # XLA lowering runs on 1-sublane (N,) vectors and measures SLOWER
        # than the refactorize path on v5e (4.4 vs 1.3 s/sweep, vehicle
        # 10240x1500) — it needs a fused Pallas update kernel to pay off.
        # It also multiplies XLA compile time for large basis counts.
        rank1 = False
    deterministic = ssm.is_deterministic
    process_chol = kern.process_chol
    if process_chol is not None:
        _q_logdet = jnp.sum(jnp.log(jnp.diagonal(process_chol)))

    def ref_contribution(ref_state_t, ref_iv_t, inp_t):
        """Rank-1 statistics of the reference at one time point
        (batch-last with N=1 trailing axis dropped)."""
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

    def common_tail(
        key, draw_fn, state_g, iv_g, ll_aux_g,
        inp_prev, inp_cur, obs, ref_x, ref_iv,
    ):
        """Propagate + pin + draw + pin, shared by both formulations.

        Takes already-gathered payloads (one fused gather upstream — see
        ``APFKernel.packed_gather``) and a ``draw_fn(key, new_state) ->
        (new_iv, new_basis)`` closure (fused factorize+draw for the direct
        path, augmented-factor draw for the rank-1 path)."""
        key, key_state = jax.random.split(key)
        new_state = kern.propagate_all(key_state, state_g, inp_prev, iv_g)
        new_state = new_state.at[:, -1].set(ref_x)

        key, key_iv = jax.random.split(key)
        new_iv, new_basis = draw_fn(key_iv, new_state)
        new_iv = tuple(
            new_iv[i].at[:, -1].set(jnp.atleast_1d(ref_iv[i]))
            for i in range(n_gp)
        )
        ll_new = kern.log_lik_all(obs, new_state, inp_cur, new_iv)
        new_log_weights = ll_new - ll_aux_g
        return new_state, new_iv, new_basis, new_log_weights

    # -- rank-1 factor-carry formulation ------------------------------------

    def step_rank1(carry, xs):
        log_weights, state, int_vars, Fs, dfs, Fps, dfps = carry
        obs, inp_prev, inp_cur, ref_x, ref_iv, key = xs

        factors = tuple(
            cholup.aug_to_factor(Fs[i], dfs[i], ms[i]) for i in range(n_gp)
        )
        aux_state, aux_iv, lw_aux, ll_aux = kern.auxiliary(
            state, int_vars, factors, inp_prev, inp_cur, obs, log_weights
        )

        key, key_res = jax.random.split(key)
        ancestors = resampling.systematic(key_res, jax.nn.softmax(lw_aux))

        # --- ancestor sampling for the reference particle ---
        # marginal-likelihood correction g_t - g_T from MNIW log base
        # measures (parity: /root/reference/src/Algorithm3.py:92-106) —
        # both terms come straight off the carried factors' diagonals
        g_diff = jnp.zeros_like(lw_aux)
        for i in range(n_gp):
            without_future = cholup.aug_log_base_measure(
                Fs[i], dfs[i], ms[i]
            )
            with_future = cholup.aug_log_base_measure(
                Fps[i], dfps[i], ms[i]
            )
            g_diff = g_diff + without_future - with_future
        h_x = transition_logpdf_to_ref(aux_state, ref_x, lw_aux)
        # Deviation: the reference builds the ancestor weights on the
        # *auxiliary* weights (lookahead factor included,
        # /root/reference/src/Algorithm3.py:115); the valid AS weight uses
        # the time-(t-1) importance weights — the lookahead factor cancels
        # against the pinned particle's later 1/nu correction. Verified
        # against an exact Kalman smoother (tests/test_invariance.py).
        key, key_ref = jax.random.split(key)
        ref_idx = resampling.categorical_from_weights(
            key_ref, jax.nn.softmax(log_weights + g_diff + h_x)
        )
        ancestors = ancestors.at[-1].set(ref_idx)

        # one fused gather for every per-particle payload
        state_g, iv_g, F_g, df_g, Fp_g, dfp_g, ll_aux_g = (
            kern.packed_gather(
                (state, int_vars, Fs, dfs, Fps, dfps, ll_aux), ancestors
            )
        )
        factors_res = tuple(
            cholup.aug_to_factor(F_g[i], df_g[i], ms[i]) for i in range(n_gp)
        )

        def draw_rank1(key_iv, new_state):
            return kern.draw_int_vars(key_iv, factors_res, new_state, inp_cur)

        new_state, new_iv, new_basis, new_log_weights = common_tail(
            key, draw_rank1, state_g, iv_g, ll_aux_g,
            inp_prev, inp_cur, obs, ref_x, ref_iv,
        )

        # --- O(p^2) factor maintenance instead of refactorization ---
        # data update [phi; y] per particle; the plus-factor additionally
        # downdates the reference's own contribution at this step
        # (parity: /root/reference/src/Algorithm3.py:162-174)
        new_Fs, new_Fps = [], []
        for i in range(n_gp):
            z = jnp.concatenate([new_basis[i], new_iv[i]], axis=0)
            new_Fs.append(cholup.chol_rank1_update_bl(F_g[i], z))
            phi_ref = kern.gps[i].basis_fn(ref_x, inp_cur)
            z_ref = jnp.concatenate(
                [phi_ref, jnp.atleast_1d(ref_iv[i])]
            )[:, None]
            new_Fps.append(
                cholup.chol_rank1_update_bl(
                    cholup.chol_rank1_downdate_bl(Fp_g[i], z_ref), z
                )
            )
        new_dfs = tuple(d + 1.0 for d in df_g)
        new_dfps = tuple(dfp_g)  # +1 datum, -1 remaining future

        norm_w = jax.nn.softmax(new_log_weights)
        # traces stay batch-last (d, N): a (T, N, d) trace with d of 1-2
        # tile-pads lanes 64x when it feeds the backward-reconstruction
        # gather (25 GB / OOM at 32k particles) — see
        # resampling.reconstruct_trajectory_bl
        emits = (
            new_state,
            tuple(new_iv),
            new_log_weights,
            ancestors,
            1.0 / jnp.sum(norm_w * norm_w),
        )
        return (
            new_log_weights,
            new_state,
            new_iv,
            tuple(new_Fs),
            new_dfs,
            tuple(new_Fps),
            new_dfps,
        ), emits

    # -- refactorize-per-step formulation (A/B validation path) -------------

    def step_direct(carry, xs):
        log_weights, state, int_vars, Ss, ref_stats = carry
        obs, inp_prev, inp_cur, ref_x, ref_iv, key = xs

        aux_state, aux_iv, lw_aux, ll_aux, fps, lws = (
            kern.auxiliary_fused_packed_f(
                Ss, 1.0, state, int_vars, inp_prev, inp_cur, obs,
                log_weights, emit_factor=kern.reuse_factor,
            )
        )

        key, key_res = jax.random.split(key)
        ancestors = resampling.systematic(key_res, jax.nn.softmax(lw_aux))

        g_diff = jnp.zeros_like(lw_aux)
        for i in range(n_gp):
            # the (small) prior + ref-future offset folds into the fused
            # kernel — prior+ref+stats is never materialized per particle
            prior_eff = mniw.MNIW(
                kern.priors[i].T0 + ref_stats[i].T0,
                kern.priors[i].T1 + ref_stats[i].T1,
                kern.priors[i].T2 + ref_stats[i].T2,
                kern.priors[i].T3 + ref_stats[i].T3,
            )
            with_future = mniw.log_base_measure_packed_bl(
                Ss[i], prior_eff, ms[i], ns[i], use_pallas=kern.use_pallas
            )
            without_future = mniw.log_base_measure_from_projected_bl(
                fps[i], ms[i]
            )
            g_diff = g_diff + without_future - with_future
        h_x = transition_logpdf_to_ref(aux_state, ref_x, lw_aux)
        key, key_ref = jax.random.split(key)
        ref_idx = resampling.categorical_from_weights(
            key_ref, jax.nn.softmax(log_weights + g_diff + h_x)
        )
        # the ancestor-sampled last entry breaks sortedness, so the
        # fused-gather kernel below gathers with the sorted systematic
        # ancestors and the reference column is rebuilt exactly afterwards
        # (its statistics column is a closed form of S[:, ref_idx] and the
        # pinned reference datum); the emitted ancestry trace carries the
        # patched indices
        ancestors_sorted = ancestors
        ancestors = ancestors.at[-1].set(ref_idx)

        state_g, iv_g, ll_aux_g = kern.packed_gather(
            (state, int_vars, ll_aux), ancestors
        )

        key, key_state = jax.random.split(key)
        new_state = kern.propagate_all(key_state, state_g, inp_prev, iv_g)
        new_state = new_state.at[:, -1].set(ref_x)

        # fused resampling gather + draw + rank-1 statistics update (ONE
        # kernel per GP, the gathered statistics never exist in HBM); the
        # reference particle's statistics column and interface variable
        # are then replaced wholesale: column -1 of the new statistics is
        # S[:, ref_idx] + suff(ref_iv, phi(ref_x)) by definition
        # (parity: /root/reference/src/Algorithm3.py:147-174)
        key, key_iv = jax.random.split(key)
        Ss_new, new_iv, new_basis, _ = kern.draw_update_gather_all_packed(
            key_iv, Ss, ancestors_sorted, 1.0, new_state, inp_cur,
            factors=lws,
        )
        pinned_iv = tuple(
            jnp.atleast_1d(ref_iv[i]).astype(dtype) for i in range(n_gp)
        )
        Ss_new = tuple(
            Ss_new[i].at[:, -1].set(
                jnp.take(Ss[i], ref_idx, axis=-1)
                + mniw.pack_suff_col(pinned_iv[i], new_basis[i][:, -1])
            )
            for i in range(n_gp)
        )
        new_iv = tuple(
            new_iv[i].at[:, -1].set(pinned_iv[i]) for i in range(n_gp)
        )
        ll_new = kern.log_lik_all(obs, new_state, inp_cur, new_iv)
        new_log_weights = ll_new - ll_aux_g

        ref_T = ref_contribution(ref_x, ref_iv, inp_cur)
        new_ref_stats = tuple(
            jax.tree_util.tree_map(lambda s, t: s - t, ref_stats[i], ref_T[i])
            for i in range(n_gp)
        )

        norm_w = jax.nn.softmax(new_log_weights)
        # traces stay batch-last (d, N): a (T, N, d) trace with d of 1-2
        # tile-pads lanes 64x when it feeds the backward-reconstruction
        # gather (25 GB / OOM at 32k particles) — see
        # resampling.reconstruct_trajectory_bl
        emits = (
            new_state,
            tuple(new_iv),
            new_log_weights,
            ancestors,
            1.0 / jnp.sum(norm_w * norm_w),
        )
        return (
            new_log_weights,
            new_state,
            new_iv,
            Ss_new,
            new_ref_stats,
        ), emits

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
        n_steps = observations.shape[0]

        key, key_init = jax.random.split(key)
        log_w0, state0, iv0, stats0 = kern.init_particles(
            key_init, n_particles, inputs[0], init_state_mean, init_state_cov
        )

        # pin the last particle to the reference at t=0
        # (parity: /root/reference/src/Algorithm3.py:220-232)
        state0 = state0.at[:, -1].set(ref_state[0])
        iv0 = tuple(
            iv0[i].at[:, -1].set(jnp.atleast_1d(ref_int_vars[i][0]))
            for i in range(n_gp)
        )
        ref_T0 = ref_contribution(
            ref_state[0], tuple(r[0] for r in ref_int_vars), inputs[0]
        )
        stats0 = tuple(
            mniw.MNIW(
                stats0[i].T0.at[..., -1].set(ref_T0[i].T0),
                stats0[i].T1.at[..., -1].set(ref_T0[i].T1),
                stats0[i].T2.at[..., -1].set(ref_T0[i].T2),
                stats0[i].T3.at[-1].set(ref_T0[i].T3),
            )
            for i in range(n_gp)
        )
        # the reference's remaining-future statistics exclude t=0
        # (parity: /root/reference/src/Algorithm3.py:234-246)
        ref_stats = tuple(
            jax.tree_util.tree_map(
                lambda s, t: jnp.asarray(s, dtype=dtype) - t,
                ref_summed_stats[i],
                ref_T0[i],
            )
            for i in range(n_gp)
        )

        keys = jax.random.split(key, n_steps)
        xs = (
            observations[1:],
            inputs[:-1],
            inputs[1:],
            ref_state[1:],
            tuple(r[1:] for r in ref_int_vars),
            keys[:-1],
        )
        if rank1:
            Fs, dfs, Fps, dfps = [], [], [], []
            for i in range(n_gp):
                nat = jax.tree_util.tree_map(
                    lambda p, s: p + s, kern.priors_bl[i], stats0[i]
                )
                F, df = cholup.aug_factorize_bl(nat)
                nat_p = jax.tree_util.tree_map(
                    lambda n_, r: n_ + (r[..., None] if r.ndim else r),
                    nat,
                    ref_stats[i],
                )
                Fp, dfp = cholup.aug_factorize_bl(nat_p)
                Fs.append(F)
                dfs.append(df)
                Fps.append(Fp)
                dfps.append(dfp)
            carry0 = (
                log_w0, state0, iv0,
                tuple(Fs), tuple(dfs), tuple(Fps), tuple(dfps),
            )
            carry, emits = jax.lax.scan(step_rank1, carry0, xs)
        else:
            # per-particle statistics ride the scan packed (one (rows, N)
            # matrix per GP) — see bipk_tpu.algorithms.apf; the small ref
            # stats stay structured
            carry0 = (
                log_w0, state0, iv0,
                tuple(mniw.pack_stats_bl(st) for st in stats0),
                ref_stats,
            )
            carry, emits = jax.lax.scan(step_direct, carry0, xs)
        state_tr, iv_tr, log_w_tr, ancestors, ess = emits
        final_log_w = carry[0]

        states = jnp.concatenate([state0[None], state_tr])
        int_vars = tuple(
            jnp.concatenate([iv0[i][None], iv_tr[i]]) for i in range(n_gp)
        )

        # draw one trajectory by backward ancestry
        # (parity: /root/reference/src/Algorithm3.py:291-298)
        idx = resampling.categorical_from_weights(
            keys[-1], jax.nn.softmax(final_log_w)
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
