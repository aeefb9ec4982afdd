"""Classic particle Gibbs with ancestor sampling (explicit parameter draws).

The baseline sampler: the transition is *purely* the basis-expansion GP
``x_t ~ N(A phi(x_{t-1}, u_t), S)`` (no physics skeleton), and the Gibbs
sweep alternates a conditional SMC trajectory draw with a conjugate MNIW
parameter draw (inverse-Wishart via Bartlett + matrix normal).

Behavioral parity: ``condSequentialMonteCarlo`` and ``PGAS``
(``/root/reference/src/PGAS.py``), with both loops fused into scans. Note
the reference's input-time convention here differs from Algorithm 1: the
cSMC propagates with the input at the *current* step
(``/root/reference/src/PGAS.py:52-77``) while the parameter update pairs
``(x_{t-1}, u_{t-1}) -> x_t`` (``:294-297``); both are preserved.

Two reference bugs are deliberately not reproduced (both verified against
an exact Kalman/RTS smoother, see ``tests/test_invariance.py``):

1. the reference draws systematic resampling ancestors but proposes from
   the *pre-resampling* states (``PGAS.py:129-134``), breaking the
   ancestral linkage its own backward reconstruction assumes;
2. the reference's ancestor-sampling weight for the pinned particle
   includes the auxiliary lookahead factor (``PGAS.py:117``); the valid AS
   weight is ``w_{t-1} f(ref_t | x_{t-1})`` — the lookahead factor cancels
   against the pinned particle's subsequent ``1/nu`` weight correction, and
   keeping it measurably breaks cSMC invariance.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from bipk_tpu.ops import mniw, resampling
from bipk_tpu.ops.gaussian import mvn_logpdf_chol


class PGASResult(NamedTuple):
    """Mirrors ``PGAS.__call__`` (``/root/reference/src/PGAS.py:394-397``)."""

    states: jax.Array  # (T, K, dx)
    log_likelihood: jax.Array  # (T, K)
    coeffs: jax.Array  # (K, dx, m) sampled coefficient matrices
    covs: jax.Array  # (K, dx, dx) sampled noise covariances


def build_pgas_csmc(
    basis_fn: Callable,
    likelihood_fn: Callable,
    n_particles: int,
    dtype=jnp.float32,
) -> Callable:
    """Build the fixed-parameter conditional SMC sweep used inside PGAS.

    Returns ``sweep(key, observations, inputs, init_mean, init_cov,
    ref_state, A, S) -> trajectory``. Exposed separately so the kernel's
    invariance can be validated against exact (Kalman/RTS) posteriors on
    linear-Gaussian models (``tests/test_invariance.py``).

    Parity: ``condSequentialMonteCarlo``
    (``/root/reference/src/PGAS.py:14-228``), modulo the two bug fixes in
    the module docstring.
    """

    def csmc_sweep(key, observations, inputs, init_mean, init_cov, ref_state, A, S):
        n_steps = observations.shape[0]
        chol_S = mniw.chol_spd(S)

        key, key_init = jax.random.split(key)
        state0 = jax.random.multivariate_normal(
            key_init,
            jnp.asarray(init_mean, dtype=dtype),
            jnp.asarray(init_cov, dtype=dtype),
            (n_particles,),
            dtype=dtype,
        )
        state0 = state0.at[-1].set(ref_state[0])
        log_w0 = jnp.zeros((n_particles,), dtype=dtype)

        def step(carry, xs):
            log_weights, state = carry
            obs, inp, ref_x, key = xs

            phi = jax.vmap(lambda x: basis_fn(x, inp))(state)
            aux_state = phi @ A.T
            ll_aux = jax.vmap(lambda x: likelihood_fn(obs, x, inp))(aux_state)
            lw_aux = ll_aux + log_weights

            key, key_res = jax.random.split(key)
            ancestors = resampling.systematic(
                key_res, jax.nn.softmax(lw_aux)
            )

            # ancestor draw for the pinned reference particle: the valid AS
            # weight w_{t-1} f(ref_t | x_{t-1}) (bug-fix #2, module docstring)
            h_x = jax.vmap(
                lambda m: mvn_logpdf_chol(ref_x, m, chol_S)
            )(aux_state)
            key, key_ref = jax.random.split(key)
            ref_idx = resampling.categorical_from_weights(
                key_ref, jax.nn.softmax(log_weights + h_x)
            )
            ancestors = ancestors.at[-1].set(ref_idx)

            # propose from the resampled ancestors (bug-fix #1)
            key, key_state = jax.random.split(key)
            z = jax.random.normal(
                key_state, (n_particles, state.shape[-1]), dtype=dtype
            )
            new_state = phi[ancestors] @ A.T + z @ chol_S.T
            new_state = new_state.at[-1].set(ref_x)

            ll_new = jax.vmap(lambda x: likelihood_fn(obs, x, inp))(new_state)
            new_log_weights = ll_new - ll_aux[ancestors]

            return (new_log_weights, new_state), (
                new_state,
                new_log_weights,
                ancestors,
            )

        keys = jax.random.split(key, n_steps)
        xs = (observations[1:], inputs[1:], ref_state[1:], keys[:-1])
        (final_log_w, _), (state_tr, _, ancestors) = jax.lax.scan(
            step, (log_w0, state0), xs
        )
        states = jnp.concatenate([state0[None], state_tr])

        idx = resampling.categorical_from_weights(
            keys[-1], jax.nn.softmax(final_log_w)
        )
        traj, _ = resampling.reconstruct_trajectory(states, ancestors, idx)
        return traj

    return csmc_sweep


def build_pgas(
    basis_fn: Callable,
    likelihood_fn: Callable,
    prior: mniw.MNIW,
    n_particles: int,
    n_iterations: int,
    dtype=jnp.float32,
    fused: bool = True,
) -> Callable:
    """Build the classic PGAS sampler.

    ``basis_fn(x, u) -> phi``; ``likelihood_fn(obs, x, u) -> logpdf``;
    ``prior`` the MNIW prior over ``(A, S)`` in natural form. Returns
    ``run(key, observations, inputs, init_state_mean, init_state_cov,
    init_ref_state) -> PGASResult``.
    """
    prior_t = prior
    csmc_sweep = build_pgas_csmc(basis_fn, likelihood_fn, n_particles, dtype)

    def sample_params(key, trajectory, inputs):
        """Conjugate draw given a trajectory.

        Parity: ``PGAS.sample_params`` (``/root/reference/src/PGAS.py:
        288-343``) — statistics pair ``(x_{t-1}, u_{t-1}) -> x_t``.
        """
        phi = jax.vmap(basis_fn)(trajectory[:-1], inputs[:-1])
        stats = jax.vmap(mniw.suff_stat)(trajectory[1:], phi)
        summed = jax.tree_util.tree_map(lambda s: jnp.sum(s, axis=0), stats)
        posterior = jax.tree_util.tree_map(
            lambda p, s: jnp.asarray(p, dtype=dtype) + s, prior_t, summed
        )
        return mniw.sample_parameters(key, posterior)

    def run(
        key,
        observations,
        inputs,
        init_state_mean,
        init_state_cov,
        init_ref_state,
    ):
        observations = jnp.asarray(observations, dtype=dtype)
        inputs = jnp.asarray(inputs, dtype=dtype)
        ref0 = jnp.atleast_2d(jnp.asarray(init_ref_state, dtype=dtype).T).T

        key, key_params = jax.random.split(key)
        A0, S0 = sample_params(key_params, ref0, inputs)

        def body(carry, key_k):
            ref, A, S = carry
            key_sweep, key_params = jax.random.split(key_k)
            new_ref = csmc_sweep(
                key_sweep,
                observations,
                inputs,
                init_state_mean,
                init_state_cov,
                ref,
                A,
                S,
            )
            new_A, new_S = sample_params(key_params, new_ref, inputs)
            return (new_ref, new_A, new_S), (new_ref, new_A, new_S)

        if fused:
            keys = jax.random.split(key, n_iterations - 1)
            _, (refs, As, Ss) = jax.lax.scan(body, (ref0, A0, S0), keys)
        else:
            jit_body = jax.jit(body)
            carry = (ref0, A0, S0)
            outs = []
            for _ in range(n_iterations - 1):
                key, key_k = jax.random.split(key)
                carry, out = jit_body(carry, key_k)
                outs.append(out)
            refs = jnp.stack([o[0] for o in outs])
            As = jnp.stack([o[1] for o in outs])
            Ss = jnp.stack([o[2] for o in outs])

        states_kt = jnp.concatenate([ref0[None], refs])
        coeffs = jnp.concatenate([A0[None], As])
        covs = jnp.concatenate([S0[None], Ss])
        states = jnp.swapaxes(states_kt, 0, 1)  # (T, K, dx)

        log_lik = jax.vmap(
            jax.vmap(likelihood_fn, in_axes=(None, 0, None)),
            in_axes=(0, 0, 0),
        )(observations, states, inputs)

        return PGASResult(
            states=states,
            log_likelihood=log_lik,
            coeffs=coeffs,
            covs=covs,
        )

    return run
