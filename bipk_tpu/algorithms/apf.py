"""Algorithm 1 — online auxiliary particle filter with joint GP learning.

Every particle carries its own MNIW sufficient statistics per learned
sub-function; each step forgets, looks ahead through the physics skeleton +
GP posterior mean, resamples on first-stage weights, propagates, draws the
interface variables from the per-particle matrix-t predictive, and applies a
rank-1 statistics update.

Behavioral parity: ``Algorithm1`` (``/root/reference/src/Algorithm1.py``).
Architectural deltas (TPU-first):

- the host time loop with one jitted dispatch per step
  (``Algorithm1.py:420``) is a single ``lax.scan`` — one dispatch per sweep;
- ``prior + stats`` is Cholesky-factored **once** per step and the factor is
  gathered through resampling, serving both the auxiliary posterior mean and
  the post-resample matrix-t predictive (the reference factors twice:
  ``Algorithm1.py:212`` and ``:252``);
- traces accumulate on device; the weighted sufficient-statistics reduction
  the reference performs on host per step (``Algorithm1.py:446-457``) is an
  in-scan ``einsum``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import mniw, resampling
from bipk_tpu.ops.gaussian import mvn_logpdf_chol


class APFResult(NamedTuple):
    """Full-trace result, mirroring ``Algorithm1.__call__``'s returns
    (``/root/reference/src/Algorithm1.py:483-492``)."""

    states: jax.Array  # (T, N, dx)
    int_vars: tuple  # each (T, N, n_i)
    stats_mean: tuple  # each MNIW with leading (T, ...) — weighted means
    weights: jax.Array  # (T, N) normalized
    ancestors: jax.Array  # (T-1, N)
    final_stats: tuple  # each MNIW with leading (N, ...)
    outputs: jax.Array  # (T, N, dy)
    log_likelihood: jax.Array  # (T, N)
    ess: jax.Array  # (T,)


def _as_tuple(x) -> tuple:
    return tuple(x) if isinstance(x, (tuple, list)) else (x,)


def init_particles(
    key,
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    inputs0,
    init_state_mean,
    init_state_cov,
    dtype,
):
    """Draw initial state/interface-variable particles and their statistics.

    Parity with ``Algorithm1._init_algorithm``
    (``/root/reference/src/Algorithm1.py:100-177``).
    """
    key, key_state = jax.random.split(key)
    mean = jnp.asarray(init_state_mean, dtype=dtype)
    cov = jnp.asarray(init_state_cov, dtype=dtype)
    state = jax.random.multivariate_normal(
        key_state, mean, cov, (n_particles,), dtype=dtype
    )

    int_vars = []
    for gp in gps:
        key, key_iv = jax.random.split(key)
        iv = jax.random.multivariate_normal(
            key_iv,
            jnp.asarray(jnp.atleast_1d(gp.init_mean), dtype=dtype),
            jnp.asarray(jnp.atleast_2d(gp.init_cov), dtype=dtype),
            (n_particles,),
            dtype=dtype,
        )
        int_vars.append(iv)
    int_vars = tuple(int_vars)

    stats = tuple(
        jax.vmap(mniw.suff_stat)(
            int_vars[i],
            jax.vmap(lambda x: gps[i].basis_fn(x, inputs0))(state),
        )
        for i in range(len(gps))
    )
    log_weights = jnp.zeros((n_particles,), dtype=dtype)
    return log_weights, state, int_vars, stats


def weighted_stats(stats: tuple, weights: jax.Array) -> tuple:
    """Importance-weighted mean of per-particle statistics.

    The per-step reduction the reference runs on host with ``np.einsum``
    (``/root/reference/src/Algorithm1.py:446-457``).
    """
    return tuple(
        jax.tree_util.tree_map(
            lambda s: jnp.einsum("n...,n->...", s, weights), st
        )
        for st in stats
    )


def make_step(
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    forgetting_factor: float,
    dtype,
):
    """Build the fused APF step ``(carry, xs) -> (carry, emits)``.

    Semantics of ``Algorithm1.step``
    (``/root/reference/src/Algorithm1.py:298-397``) with the shared-factor
    optimization described in the module docstring.
    """
    n_gp = len(gps)
    priors = tuple(gp.prior_as(dtype) for gp in gps)
    process_chol = None if ssm.is_deterministic else ssm.process_chol(dtype)
    output_chol = ssm.output_chol(dtype)

    def log_lik(obs, state, inp, int_vars):
        out = jnp.atleast_1d(ssm.output(state, inp, *int_vars))
        return mvn_logpdf_chol(obs, out, output_chol)

    def propagate(key, state, inp, int_vars):
        nxt = ssm.transition(state, inp, *int_vars)
        if process_chol is None:
            return nxt
        z = jax.random.normal(key, nxt.shape, dtype=dtype)
        return nxt + process_chol @ z

    def step(carry, xs):
        log_weights, state, int_vars, stats = carry
        obs, inp_prev, inp_cur, key = xs

        # --- statistics time update (exponential forgetting) ---
        stats = tuple(st.scale(forgetting_factor) for st in stats)

        # --- factor prior + stats once; reuse across aux mean + predictive
        factors = tuple(
            jax.vmap(mniw.factorize)(
                jax.tree_util.tree_map(
                    lambda p, s: p[None] + s if p.ndim == s.ndim - 1 else p + s,
                    priors[i],
                    stats[i],
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
            lambda x, *iv: log_lik(obs, x, inp_cur, iv)
        )(aux_state, *aux_iv)
        lw_aux = ll_aux + log_weights

        # --- first-stage (auxiliary) resampling ---
        key, key_res = jax.random.split(key)
        ancestors = resampling.systematic(key_res, jax.nn.softmax(lw_aux))

        # --- propagate resampled states ---
        key, key_state = jax.random.split(key)
        iv_gathered = tuple(iv[ancestors] for iv in int_vars)
        new_state = jax.vmap(
            lambda k, x, *iv: propagate(k, x, inp_prev, iv)
        )(
            jax.random.split(key_state, n_particles),
            state[ancestors],
            *iv_gathered,
        )

        # --- matrix-t predictive draw of the interface variables ---
        key, key_iv = jax.random.split(key)
        keys_gp = jax.random.split(key_iv, n_gp)
        factors_res = tuple(
            jax.tree_util.tree_map(lambda a: a[ancestors], f) for f in factors
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

        # --- rank-1 statistics measurement update ---
        stats_gathered = tuple(
            jax.tree_util.tree_map(lambda a: a[ancestors], st) for st in stats
        )
        new_stats = tuple(
            stats_gathered[i]
            + jax.vmap(mniw.suff_stat)(new_iv[i], new_basis[i])
            for i in range(n_gp)
        )

        # --- second-stage weights ---
        ll_new = jax.vmap(
            lambda x, *iv: log_lik(obs, x, inp_cur, iv)
        )(new_state, *new_iv)
        new_log_weights = ll_new - ll_aux[ancestors]

        new_carry = (new_log_weights, new_state, new_iv, new_stats)
        norm_w = jax.nn.softmax(new_log_weights)
        emits = (
            new_state,
            new_iv,
            new_log_weights,
            ancestors,
            weighted_stats(new_stats, norm_w),
            1.0 / jnp.sum(norm_w * norm_w),
        )
        return new_carry, emits

    return step


def build_apf(
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    forgetting_factor: float = 1.0,
    dtype=jnp.float32,
) -> Callable:
    """Build the fused online APF sweep.

    Returns ``run(key, observations, inputs, init_state_mean,
    init_state_cov) -> APFResult``. Shapes: ``observations (T, dy)``,
    ``inputs (T, du)`` (``du`` may be 0).
    """
    gps = _as_tuple(gps)
    n_gp = len(gps)
    step = make_step(ssm, gps, n_particles, forgetting_factor, dtype)

    def run(key, observations, inputs, init_state_mean, init_state_cov):
        observations = jnp.asarray(observations, dtype=dtype)
        inputs = jnp.asarray(inputs, dtype=dtype)
        n_steps = observations.shape[0]

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

        keys = jax.random.split(key, n_steps - 1)
        xs = (observations[1:], inputs[:-1], inputs[1:], keys)
        carry0 = (log_w0, state0, iv0, stats0)
        carry, emits = jax.lax.scan(step, carry0, xs)
        (
            state_tr,
            iv_tr,
            log_w_tr,
            ancestors,
            stats_mean_tr,
            ess_tr,
        ) = emits
        _, _, _, final_stats = carry

        # prepend t=0 entries
        states = jnp.concatenate([state0[None], state_tr])
        int_vars = tuple(
            jnp.concatenate([iv0[i][None], iv_tr[i]]) for i in range(n_gp)
        )
        log_weights = jnp.concatenate([log_w0[None], log_w_tr])
        w0 = jax.nn.softmax(log_w0)
        stats_mean = tuple(
            jax.tree_util.tree_map(
                lambda first, rest: jnp.concatenate([first[None], rest]),
                weighted_stats((stats0[i],), w0)[0],
                stats_mean_tr[i],
            )
            for i in range(n_gp)
        )
        ess = jnp.concatenate(
            [(1.0 / jnp.sum(w0 * w0))[None], ess_tr]
        )
        weights = jax.nn.softmax(log_weights, axis=1)

        # final vmapped output / log-likelihood evaluation over all traces
        # (parity: /root/reference/src/Algorithm1.py:462-481)
        output_chol = ssm.output_chol(dtype)

        def out_and_ll(obs, x, inp, ivs):
            out = jnp.atleast_1d(ssm.output(x, inp, *ivs))
            return out, mvn_logpdf_chol(obs, out, output_chol)

        outputs, log_lik = jax.vmap(
            jax.vmap(out_and_ll, in_axes=(None, 0, None, 0)),
            in_axes=(0, 0, 0, 0),
        )(observations, states, inputs, int_vars)

        return APFResult(
            states=states,
            int_vars=int_vars,
            stats_mean=stats_mean,
            weights=weights,
            ancestors=ancestors,
            final_stats=final_stats,
            outputs=outputs,
            log_likelihood=log_lik,
            ess=ess,
        )

    return run
