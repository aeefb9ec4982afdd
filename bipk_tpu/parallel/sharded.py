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

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

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
    final_stats: tuple  # each MNIW with leading (N, ...) sharded


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
):
    """Build the particle-sharded online APF sweep.

    Returns ``run(key, observations, inputs, init_state_mean,
    init_state_cov) -> ShardedAPFResult``; semantics follow
    ``bipk_tpu.algorithms.apf`` (Algorithm 1) with the sharded resampling
    scheme described in the module docstring (``resampling_scheme`` is
    ``"local"`` or ``"exact"``).
    """
    if resampling_scheme not in ("local", "exact"):
        raise ValueError(
            f"resampling_scheme must be 'local' or 'exact', "
            f"got {resampling_scheme!r}"
        )
    kern = APFKernel(ssm, gps, dtype)
    n_gp = kern.n_gp
    n_dev = mesh.devices.size
    if n_particles % n_dev:
        raise ValueError(
            f"n_particles={n_particles} not divisible by mesh size {n_dev}"
        )
    n_loc = n_particles // n_dev

    def reduce_moments(w_global, state, int_vars, stats):
        sm = jax.lax.psum(
            jnp.tensordot(state, w_global, axes=(-1, 0)), PARTICLE_AXIS
        )
        ivm = tuple(
            jax.lax.psum(
                jnp.tensordot(iv, w_global, axes=(-1, 0)), PARTICLE_AXIS
            )
            for iv in int_vars
        )
        stm = tuple(
            jax.tree_util.tree_map(
                lambda s: jax.lax.psum(
                    jnp.tensordot(s, w_global, axes=(-1, 0)), PARTICLE_AXIS
                ),
                st,
            )
            for st in stats
        )
        ess = 1.0 / jax.lax.psum(jnp.sum(w_global * w_global), PARTICLE_AXIS)
        return sm, ivm, stm, ess

    def sweep(key, observations, inputs, init_mean, init_cov):
        """Per-shard body (runs under shard_map).

        Key discipline: per-step keys in the scan are **shared** across
        shards (the exact scheme needs an identical stratification offset
        everywhere); anything drawing shard-local randomness folds in the
        shard index first.
        """
        shard = jax.lax.axis_index(PARTICLE_AXIS)

        key, key_init = jax.random.split(key)
        log_weights, state, int_vars, stats = kern.init_particles(
            jax.random.fold_in(key_init, shard), n_loc,
            inputs[0], init_mean, init_cov,
        )

        def step(carry, xs):
            log_weights, state, int_vars, stats = carry
            obs, inp_prev, inp_cur, key = xs  # key: shared across shards
            key_res, key_draws = jax.random.split(key)
            key_state, key_iv = jax.random.split(
                jax.random.fold_in(key_draws, shard)
            )

            factors = kern.factorize_all(stats, forgetting_factor)
            aux_state, aux_iv, lw_aux, ll_aux = kern.auxiliary(
                state, int_vars, factors, inp_prev, inp_cur, obs, log_weights
            )

            w_global = _global_softmax(lw_aux)
            if resampling_scheme == "exact":
                # exact global systematic resampling + ring payload fetch
                # (factors are recomputed from the redistributed statistics
                # — cheaper than rotating the factor payload over ICI)
                anc = global_resampling.global_systematic_slice(
                    key_res, w_global, PARTICLE_AXIS, n_dev
                )
                state_r, iv_r, stats_r, ll_aux_r = (
                    global_resampling.ring_redistribute(
                        (state, int_vars, stats, ll_aux),
                        anc, PARTICLE_AXIS, n_dev,
                    )
                )
                offset = jnp.zeros((), dtype=ll_aux.dtype)
            else:
                # local systematic resampling on globally normalized mass;
                # one fused gather for all payloads, factors recomputed
                shard_mass = jnp.sum(w_global)
                w_local = w_global / jnp.maximum(shard_mass, 1e-30)
                ancestors = resampling.systematic(
                    jax.random.fold_in(key_res, shard), w_local
                )
                state_r, iv_r, stats_r, ll_aux_r = kern.packed_gather(
                    (state, int_vars, stats, ll_aux), ancestors
                )
                offset = jnp.log(jnp.maximum(shard_mass * n_dev, 1e-30))
            factors_r = kern.factorize_all(stats_r, forgetting_factor)

            new_state = kern.propagate_all(key_state, state_r, inp_prev, iv_r)
            new_iv, new_basis = kern.draw_int_vars(
                key_iv, factors_r, new_state, inp_cur
            )
            new_stats = kern.update_stats(
                stats_r, new_iv, new_basis, forgetting_factor
            )

            ll_new = kern.log_lik_all(obs, new_state, inp_cur, new_iv)
            new_log_weights = ll_new - ll_aux_r + offset

            w_new = _global_softmax(new_log_weights)
            moments = reduce_moments(w_new, new_state, new_iv, new_stats)
            return (new_log_weights, new_state, new_iv, new_stats), moments

        n_steps = observations.shape[0]
        keys = jax.random.split(key, n_steps - 1)
        xs = (observations[1:], inputs[:-1], inputs[1:], keys)
        carry0 = (log_weights, state, int_vars, stats)
        carry, (sm, ivm, stm, ess) = jax.lax.scan(step, carry0, xs)
        final_log_w, final_state, _, final_stats = carry

        w0 = _global_softmax(log_weights)
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
            tuple(mniw.from_batch_last(st) for st in final_stats),
        )

    stats_spec = tuple(
        mniw.MNIW(
            P(PARTICLE_AXIS), P(PARTICLE_AXIS), P(PARTICLE_AXIS), P(PARTICLE_AXIS)
        )
        for _ in range(n_gp)
    )
    iv_spec = tuple(P() for _ in range(n_gp))
    stats_mean_spec = tuple(mniw.MNIW(P(), P(), P(), P()) for _ in range(n_gp))
    sharded = shard_map(
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
        check_rep=False,
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

    return run
