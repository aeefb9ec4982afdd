"""Algorithm 3 — conditional SMC with ancestor sampling, marginalized GP.

The cSMC kernel inside PGAS (Algorithm 2): an APF sweep in which the last
particle is pinned to the reference trajectory, the reference's ancestor is
resampled with parameter-marginalized ancestor weights built from MNIW log
base measures, and the reference's own future sufficient statistics are
decremented step by step.

Behavioral parity: ``Algorithm3`` (``/root/reference/src/Algorithm3.py``),
with the time loop fused into one ``lax.scan`` and the backward ancestral
reconstruction (host numpy in the reference,
``/root/reference/src/Filtering.py:40-55``) as a reverse scan on device.

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

from bipk_tpu.algorithms.apf import _as_tuple, init_particles
from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import mniw, resampling
from bipk_tpu.ops.gaussian import mvn_logpdf_chol


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
) -> Callable:
    """Build the fused conditional-SMC-with-ancestor-sampling sweep.

    Returns ``run(key, observations, inputs, init_state_mean,
    init_state_cov, ref_state, ref_int_vars, ref_summed_stats) ->
    CSMCResult`` where ``ref_state (T, dx)``, ``ref_int_vars`` is a tuple of
    ``(T, n_i)`` trajectories and ``ref_summed_stats`` the tuple of summed
    MNIW statistics of the reference trajectory.
    """
    gps = _as_tuple(gps)
    n_gp = len(gps)
    priors = tuple(gp.prior_as(dtype) for gp in gps)
    deterministic = ssm.is_deterministic
    process_chol = None if deterministic else ssm.process_chol(dtype)

    def log_lik(obs, state, inp, int_vars, output_chol):
        out = jnp.atleast_1d(ssm.output(state, inp, *int_vars))
        return mvn_logpdf_chol(obs, out, output_chol)

    def ref_contribution(ref_state_t, ref_iv_t, inp_t):
        """Rank-1 statistics of the reference at one time point."""
        return tuple(
            mniw.suff_stat(
                jnp.atleast_1d(ref_iv_t[i]),
                gps[i].basis_fn(ref_state_t, inp_t),
            )
            for i in range(n_gp)
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
        observations = jnp.asarray(observations, dtype=dtype)
        inputs = jnp.asarray(inputs, dtype=dtype)
        ref_state = jnp.asarray(ref_state, dtype=dtype)
        ref_int_vars = tuple(
            jnp.asarray(jnp.atleast_2d(r.T).T, dtype=dtype)
            for r in ref_int_vars
        )
        n_steps = observations.shape[0]
        output_chol = ssm.output_chol(dtype)

        key, key_init = jax.random.split(key)
        log_w0, state0, iv0, stats0 = init_particles(
            key_init,
            ssm,
            gps,
            n_particles,
            inputs[0],
            init_state_mean,
            init_state_cov,
            dtype,
        )

        # pin the last particle to the reference at t=0
        # (parity: /root/reference/src/Algorithm3.py:220-232)
        state0 = state0.at[-1].set(ref_state[0])
        iv0 = tuple(
            iv0[i].at[-1].set(jnp.atleast_1d(ref_int_vars[i][0]))
            for i in range(n_gp)
        )
        ref_T0 = ref_contribution(
            ref_state[0], tuple(r[0] for r in ref_int_vars), inputs[0]
        )
        stats0 = tuple(
            jax.tree_util.tree_map(
                lambda s, t: s.at[-1].set(t), stats0[i], ref_T0[i]
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

        def step(carry, xs):
            log_weights, state, int_vars, stats, ref_stats = carry
            obs, inp_prev, inp_cur, ref_x, ref_iv, key = xs

            factors = tuple(
                jax.vmap(mniw.factorize)(
                    jax.tree_util.tree_map(
                        lambda p, s: p + s, priors[i], stats[i]
                    )
                )
                for i in range(n_gp)
            )

            # --- auxiliary look-ahead ---
            aux_state = jax.vmap(
                lambda x, *iv: ssm.transition(x, inp_prev, *iv)
            )(state, *int_vars)
            aux_iv = tuple(
                jax.vmap(
                    lambda f, x: mniw.factor_mean_at(
                        f, gps[i].basis_fn(x, inp_cur)
                    )
                )(factors[i], aux_state)
                for i in range(n_gp)
            )
            ll_aux = jax.vmap(
                lambda x, *iv: log_lik(obs, x, inp_cur, iv, output_chol)
            )(aux_state, *aux_iv)
            lw_aux = ll_aux + log_weights

            key, key_res = jax.random.split(key)
            ancestors = resampling.systematic(
                key_res, jax.nn.softmax(lw_aux)
            )

            # --- ancestor sampling for the reference particle ---
            # marginal-likelihood correction g_t - g_T from MNIW log base
            # measures (parity: /root/reference/src/Algorithm3.py:92-106)
            g_diff = jnp.zeros_like(lw_aux)
            for i in range(n_gp):
                with_future = jax.vmap(mniw.log_base_measure)(
                    jax.tree_util.tree_map(
                        lambda p, r, s: p + r + s,
                        priors[i],
                        ref_stats[i],
                        stats[i],
                    )
                )
                without_future = jax.vmap(mniw.log_base_measure)(
                    jax.tree_util.tree_map(
                        lambda p, s: p + s, priors[i], stats[i]
                    )
                )
                g_diff = g_diff + without_future - with_future
            if deterministic:
                h_x = jnp.zeros_like(lw_aux)
            else:
                h_x = jax.vmap(
                    lambda m: mvn_logpdf_chol(ref_x, m, process_chol)
                )(aux_state)
            lw_ancestor = lw_aux + g_diff + h_x
            key, key_ref = jax.random.split(key)
            ref_idx = resampling.categorical_from_weights(
                key_ref, jax.nn.softmax(lw_ancestor)
            )
            ancestors = ancestors.at[-1].set(ref_idx)

            # --- propagate; pin reference state ---
            key, key_state = jax.random.split(key)
            iv_gathered = tuple(iv[ancestors] for iv in int_vars)

            def propagate(k, x, *iv):
                nxt = ssm.transition(x, inp_prev, *iv)
                if process_chol is None:
                    return nxt
                z = jax.random.normal(k, nxt.shape, dtype=dtype)
                return nxt + process_chol @ z

            new_state = jax.vmap(propagate)(
                jax.random.split(key_state, n_particles),
                state[ancestors],
                *iv_gathered,
            )
            new_state = new_state.at[-1].set(ref_x)

            # --- predictive interface-variable draws; pin reference ---
            key, key_iv = jax.random.split(key)
            keys_gp = jax.random.split(key_iv, n_gp)
            factors_res = tuple(
                jax.tree_util.tree_map(lambda a: a[ancestors], f)
                for f in factors
            )
            new_basis = tuple(
                jax.vmap(lambda x: gps[i].basis_fn(x, inp_cur))(new_state)
                for i in range(n_gp)
            )
            new_iv = tuple(
                jax.vmap(
                    lambda k, f, phi: mniw.sample_predictive(
                        k, mniw.factor_predictive(f, phi)
                    )
                )(
                    jax.random.split(keys_gp[i], n_particles),
                    factors_res[i],
                    new_basis[i],
                )
                for i in range(n_gp)
            )
            new_iv = tuple(
                new_iv[i].at[-1].set(jnp.atleast_1d(ref_iv[i]))
                for i in range(n_gp)
            )

            # --- statistics updates ---
            stats_gathered = tuple(
                jax.tree_util.tree_map(lambda a: a[ancestors], st)
                for st in stats
            )
            new_stats = tuple(
                stats_gathered[i]
                + jax.vmap(mniw.suff_stat)(new_iv[i], new_basis[i])
                for i in range(n_gp)
            )

            # decrement the reference's own contribution at this step
            # (parity: /root/reference/src/Algorithm3.py:162-174)
            ref_T = ref_contribution(ref_x, ref_iv, inp_cur)
            new_ref_stats = tuple(
                jax.tree_util.tree_map(
                    lambda s, t: s - t, ref_stats[i], ref_T[i]
                )
                for i in range(n_gp)
            )

            ll_new = jax.vmap(
                lambda x, *iv: log_lik(obs, x, inp_cur, iv, output_chol)
            )(new_state, *new_iv)
            new_log_weights = ll_new - ll_aux[ancestors]

            norm_w = jax.nn.softmax(new_log_weights)
            new_carry = (
                new_log_weights,
                new_state,
                new_iv,
                new_stats,
                new_ref_stats,
            )
            emits = (
                new_state,
                new_iv,
                new_log_weights,
                ancestors,
                1.0 / jnp.sum(norm_w * norm_w),
            )
            return new_carry, emits

        keys = jax.random.split(key, n_steps)
        xs = (
            observations[1:],
            inputs[:-1],
            inputs[1:],
            ref_state[1:],
            tuple(r[1:] for r in ref_int_vars),
            keys[:-1],
        )
        carry0 = (log_w0, state0, iv0, stats0, ref_stats)
        carry, emits = jax.lax.scan(step, carry0, xs)
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
        (state_traj, iv_traj), _ = resampling.reconstruct_trajectory(
            (states, int_vars), ancestors, idx
        )
        return CSMCResult(
            state_traj=state_traj,
            int_var_traj=iv_traj,
            ess=ess,
            log_weights=final_log_w,
        )

    return run
