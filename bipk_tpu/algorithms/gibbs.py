"""Algorithm 2 — PGAS outer Gibbs loop with marginalized GP parameters.

Iterates the conditional SMC kernel (Algorithm 3), each sweep conditioning
on the previously drawn trajectory, its interface variables, and its summed
sufficient statistics.

Behavioral parity: ``Algorithm2`` (``/root/reference/src/Algorithm2.py``).
The reference nests a host Gibbs loop around a host time loop — roughly
``N_iterations x N_steps`` device dispatches (600k for the oscillator
workload). Here each sweep is one fused scan, and the Gibbs loop itself can
run either fused (``lax.scan`` of sweeps — a single dispatch for the entire
sampler) or as a thin host loop for progress reporting and checkpointing.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from bipk_tpu.algorithms.csmc import build_csmc
from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import mniw
from bipk_tpu.ops.gaussian import mvn_logpdf_chol


class GibbsResult(NamedTuple):
    """Mirrors ``Algorithm2.__call__``'s returns
    (``/root/reference/src/Algorithm2.py:180-187``)."""

    states: jax.Array  # (T, K, dx) — trajectory draws per Gibbs iteration
    int_vars: tuple  # each (T, K, n_i)
    weights: jax.Array  # (T, K) uniform 1/K
    stats: tuple  # each MNIW with leading (K, ...) — summed reference stats
    outputs: jax.Array  # (T, K, dy)
    log_likelihood: jax.Array  # (T, K)


def summed_reference_stats(
    gps: Sequence[GPNode], ref_state, ref_int_vars, inputs, dtype
) -> tuple:
    """Sum the rank-1 statistics of a full reference trajectory.

    Parity with ``/root/reference/src/Algorithm2.py:84-102,139-152``.
    """
    out = []
    for i, gp in enumerate(gps):
        phi = jax.vmap(gp.basis_fn)(ref_state, inputs)
        iv = jnp.atleast_2d(jnp.asarray(ref_int_vars[i], dtype=dtype).T).T
        stats = jax.vmap(mniw.suff_stat)(iv, phi)
        out.append(jax.tree_util.tree_map(lambda s: jnp.sum(s, axis=0), stats))
    return tuple(out)


def build_gibbs(
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    n_iterations: int,
    dtype=jnp.float32,
    fused: bool = True,
    mesh=None,
    shard_mesh=None,
    n_chains: int | None = None,
    chain_mesh=None,
) -> Callable:
    """Build the marginalized-PGAS Gibbs sampler.

    Returns ``run(key, observations, inputs, init_state_mean,
    init_state_cov, init_ref_state, init_ref_int_vars) -> GibbsResult``.
    With ``fused=True`` the whole sampler is one jittable function; with
    ``fused=False`` the outer loop runs on host (use for long runs that want
    progress bars / periodic checkpointing via
    ``bipk_tpu.utils.checkpoint``).

    Multi-chip: ``mesh=`` partitions the single-chip sweep with GSPMD
    (exact semantics, XLA fallback kernels); ``shard_mesh=`` instead runs
    the hand-sharded shard_map sweep
    (:func:`bipk_tpu.parallel.sharded_csmc.build_sharded_csmc`) — fused
    Pallas kernels per shard, exact global resampling over the mesh. The
    two are mutually exclusive.

    ``n_chains=C`` runs C **independent Gibbs chains in one device
    program** (the fused sampler vmapped over the chain axis). The
    reference's workloads use a few hundred particles — a small fraction
    of one chip — so chain parallelism buys nearly free cross-chain
    convergence diagnostics (:mod:`bipk_tpu.utils.diagnostics`:
    split-R-hat, rank-normalized R-hat, bulk ESS; the reference has no
    quantitative convergence check at all). Every ``GibbsResult`` field
    gains a leading ``(C,)`` axis. The initial reference trajectory may be
    shared (``init_ref_state`` of shape ``(T, dx)`` — chains diverge
    through their RNG streams) or per-chain (leading ``(C,)`` axis on
    ``init_ref_state`` and every ``init_ref_int_vars`` entry, e.g. from
    ``C`` weighted draws out of one APF population). Works with both the
    fused sampler and the checkpointed host loop (the per-sweep dispatch
    is vmapped over chains; checkpoints store all chains).

    ``chain_mesh=`` (with ``n_chains=C``) shards the **chain axis** over a
    1-D device mesh: C/D chains per device, zero collectives (chains are
    independent), linear multi-chip scaling. This is the right multi-chip
    layout for reference-scale workloads — a few hundred particles occupy
    a sliver of one chip, so particle-axis sharding (``mesh=`` /
    ``shard_mesh=``) only pays off at large particle counts, while chain
    sharding turns the idle chips into extra posterior draws. Requires
    ``C`` divisible by the mesh's device count. Mutually exclusive with
    ``mesh=``/``shard_mesh=`` (per-chain execution stays single-device).
    """
    gps = tuple(gps) if isinstance(gps, (tuple, list)) else (gps,)
    n_gp = len(gps)
    if chain_mesh is not None and n_chains is None:
        raise ValueError("chain_mesh= requires n_chains=")
    if n_chains is not None:
        if mesh is not None or shard_mesh is not None:
            raise ValueError(
                "n_chains composes with particle-axis sharding only via "
                "chain_mesh=; per-chain execution stays single-device"
            )
        if n_chains < 2:
            raise ValueError(f"n_chains must be >= 2, got {n_chains}")
        if chain_mesh is not None:
            n_mesh_dev = chain_mesh.devices.size
            if n_chains % n_mesh_dev != 0:
                raise ValueError(
                    f"n_chains={n_chains} must be divisible by the chain "
                    f"mesh's {n_mesh_dev} devices"
                )
    if shard_mesh is not None:
        if mesh is not None:
            raise ValueError("pass either mesh= (GSPMD) or shard_mesh=, not both")
        from bipk_tpu.parallel.sharded_csmc import build_sharded_csmc

        csmc = build_sharded_csmc(
            ssm, gps, n_particles, shard_mesh, dtype=dtype
        )
    else:
        csmc = build_csmc(ssm, gps, n_particles, dtype=dtype, mesh=mesh)

    def sweep(key, observations, inputs, init_mean, init_cov, ref):
        ref_state, ref_iv, ref_stats = ref
        res = csmc(
            key,
            observations,
            inputs,
            init_mean,
            init_cov,
            ref_state,
            ref_iv,
            ref_stats,
        )
        new_state = res.state_traj
        new_iv = tuple(
            jnp.atleast_2d(v.T).T for v in res.int_var_traj
        )
        new_stats = summed_reference_stats(
            gps, new_state, new_iv, inputs, dtype
        )
        return (new_state, new_iv, new_stats)

    def finalize(observations, inputs, states_kt, iv_kt, stats_k):
        # (K, T, ...) -> (T, K, ...) like the reference's axis swap
        # (/root/reference/src/Algorithm2.py:153-157)
        states = jnp.swapaxes(states_kt, 0, 1)
        int_vars = tuple(jnp.swapaxes(v, 0, 1) for v in iv_kt)
        output_chol = ssm.output_chol(dtype)

        def out_and_ll(obs, x, inp, ivs):
            out = jnp.atleast_1d(ssm.output(x, inp, *ivs))
            return out, mvn_logpdf_chol(obs, out, output_chol)

        outputs, log_lik = jax.vmap(
            jax.vmap(out_and_ll, in_axes=(None, 0, None, 0)),
            in_axes=(0, 0, 0, 0),
        )(observations, states, inputs, int_vars)

        n_steps = observations.shape[0]
        weights = (
            jnp.ones((n_steps, n_iterations), dtype=dtype) / n_iterations
        )
        return GibbsResult(
            states=states,
            int_vars=int_vars,
            weights=weights,
            stats=stats_k,
            outputs=outputs,
            log_likelihood=log_lik,
        )

    def prepare(observations, inputs, init_ref_state, init_ref_int_vars):
        observations = jnp.asarray(observations, dtype=dtype)
        inputs = jnp.asarray(inputs, dtype=dtype)
        ref_state = jnp.atleast_2d(
            jnp.asarray(init_ref_state, dtype=dtype).T
        ).T
        ref_iv = tuple(
            jnp.atleast_2d(jnp.asarray(v, dtype=dtype).T).T
            for v in init_ref_int_vars
        )
        ref_stats = summed_reference_stats(
            gps, ref_state, ref_iv, inputs, dtype
        )
        return observations, inputs, (ref_state, ref_iv, ref_stats)

    def chain_refs(init_ref_state, init_ref_int_vars):
        """Normalize initial references to per-chain ``(C, T, ...)``
        pytrees (broadcasting a shared reference across chains)."""
        ref_state = jnp.asarray(init_ref_state, dtype=dtype)
        if ref_state.ndim == 3:  # per-chain (C, T, dx)
            if ref_state.shape[0] != n_chains:
                raise ValueError(
                    f"per-chain init_ref_state has leading axis "
                    f"{ref_state.shape[0]}, expected n_chains={n_chains}"
                )
            ref_ivs = tuple(
                jnp.asarray(v, dtype=dtype) for v in init_ref_int_vars
            )
        else:  # shared initial reference: chains diverge via RNG
            ref_state = jnp.broadcast_to(
                ref_state, (n_chains,) + ref_state.shape
            )
            ref_ivs = tuple(
                jnp.broadcast_to(
                    jnp.asarray(v, dtype=dtype),
                    (n_chains,) + jnp.asarray(v).shape,
                )
                for v in init_ref_int_vars
            )
        return ref_state, ref_ivs

    if chain_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _chain_sharding = NamedSharding(
            chain_mesh, PartitionSpec(chain_mesh.axis_names[0])
        )

        def shard_chains(tree):
            """Constrain every leaf's leading (chain) axis onto the mesh.

            Chains are independent, so this is the only annotation GSPMD
            needs: the whole vmapped sampler partitions into C/D
            single-device programs with zero collectives.
            """
            return jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, _chain_sharding
                ),
                tree,
            )
    else:

        def shard_chains(tree):
            return tree

    if fused:

        def run(
            key,
            observations,
            inputs,
            init_state_mean,
            init_state_cov,
            init_ref_state,
            init_ref_int_vars,
        ):
            observations, inputs, ref0 = prepare(
                observations, inputs, init_ref_state, init_ref_int_vars
            )

            def body(ref, key_k):
                new_ref = sweep(
                    key_k,
                    observations,
                    inputs,
                    init_state_mean,
                    init_state_cov,
                    ref,
                )
                return new_ref, new_ref

            keys = jax.random.split(key, n_iterations - 1)
            _, draws = jax.lax.scan(body, ref0, keys)
            states_kt = jnp.concatenate([ref0[0][None], draws[0]])
            iv_kt = tuple(
                jnp.concatenate([ref0[1][i][None], draws[1][i]])
                for i in range(n_gp)
            )
            stats_k = tuple(
                jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a[None], b]),
                    ref0[2][i],
                    draws[2][i],
                )
                for i in range(n_gp)
            )
            return finalize(observations, inputs, states_kt, iv_kt, stats_k)

        if n_chains is None:
            return run

        def run_chains(
            key,
            observations,
            inputs,
            init_state_mean,
            init_state_cov,
            init_ref_state,
            init_ref_int_vars,
        ):
            keys = jax.random.split(key, n_chains)
            ref_state, ref_ivs = chain_refs(init_ref_state, init_ref_int_vars)
            keys, ref_state, ref_ivs = shard_chains(
                (keys, ref_state, ref_ivs)
            )
            return shard_chains(
                jax.vmap(run, in_axes=(0, None, None, None, None, 0, 0))(
                    keys,
                    observations,
                    inputs,
                    init_state_mean,
                    init_state_cov,
                    ref_state,
                    ref_ivs,
                )
            )

        return run_chains

    def run_host(
        key,
        observations,
        inputs,
        init_state_mean,
        init_state_cov,
        init_ref_state,
        init_ref_int_vars,
        callback=None,
        checkpoint_path=None,
        checkpoint_every=50,
    ):
        """Host-loop sampler with optional crash-safe checkpoint/resume.

        With ``checkpoint_path`` set, the full chain state — iteration
        index, *current* RNG key, reference draw, and accumulated traces —
        is saved every ``checkpoint_every`` sweeps, and an existing file at
        that path resumes the chain exactly: a resumed run is bitwise
        identical to an uninterrupted one (the carried key is snapshotted
        after the last completed sweep, so the key stream continues rather
        than replays). The reference has no persistence at all until its
        final ``savemat`` (SURVEY.md §5). With ``n_chains=C`` the per-sweep
        dispatch is vmapped over C independent chains (checkpoints then
        hold every chain).
        """
        from bipk_tpu.utils import checkpoint as ckpt

        if n_chains is None:
            observations, inputs, ref = prepare(
                observations, inputs, init_ref_state, init_ref_int_vars
            )
            jit_sweep = jax.jit(sweep)
        else:
            observations = jnp.asarray(observations, dtype=dtype)
            inputs = jnp.asarray(inputs, dtype=dtype)
            ref_state, ref_ivs = chain_refs(init_ref_state, init_ref_int_vars)
            ref_ivs = tuple(
                v if v.ndim == 3 else v[..., None] for v in ref_ivs
            )
            ref_stats = jax.vmap(
                lambda s, iv: summed_reference_stats(gps, s, iv, inputs, dtype)
            )(ref_state, ref_ivs)
            ref = (ref_state, ref_ivs, ref_stats)
            if chain_mesh is not None:
                # committed chain-sharded inputs; jit propagates the
                # sharding through every sweep (no per-sweep resharding)
                ref = jax.device_put(ref, _chain_sharding)
            jit_sweep = jax.jit(
                jax.vmap(sweep, in_axes=(0, None, None, None, None, 0))
            )
        states = [ref[0]]
        ivs = [ref[1]]
        stats = [ref[2]]
        start = 1
        if checkpoint_path is not None:
            if checkpoint_every <= 0:
                raise ValueError(
                    f"checkpoint_every must be positive, got {checkpoint_every}"
                )
            restored = ckpt.load(checkpoint_path)
            if restored is not None:
                step, key, payload = restored
                if step >= n_iterations:
                    raise ValueError(
                        f"checkpoint {checkpoint_path!r} is at iteration "
                        f"{step} but this sampler runs only {n_iterations} "
                        f"iterations; it belongs to a different run — "
                        f"delete it or point --checkpoint elsewhere"
                    )
                ref = payload["ref"]
                if n_chains is not None and chain_mesh is not None:
                    ref = jax.device_put(ref, _chain_sharding)
                saved0 = jnp.asarray(payload["states"][0])
                # states entries are (T, dx), or (C, T, dx) with chains
                if saved0.shape[-2] != observations.shape[0] or (
                    saved0.ndim != (2 if n_chains is None else 3)
                    or (n_chains is not None and saved0.shape[0] != n_chains)
                ):
                    raise ValueError(
                        f"checkpoint {checkpoint_path!r} holds trajectories "
                        f"of shape {saved0.shape}, which does not match this "
                        f"run ({observations.shape[0]} steps"
                        + (
                            f", {n_chains} chains"
                            if n_chains is not None
                            else ""
                        )
                        + "); it belongs to a different run"
                    )
                states = list(payload["states"])
                ivs = list(payload["ivs"])
                stats = list(payload["stats"])
                start = step + 1
                print(
                    f"resuming Gibbs chain from {checkpoint_path} at "
                    f"sweep {start}/{n_iterations}",
                    flush=True,
                )
        def sweep_keys(key_k):
            if n_chains is None:
                return key_k
            ks = jax.random.split(key_k, n_chains)
            if chain_mesh is not None:
                ks = jax.device_put(ks, _chain_sharding)
            return ks

        for k in range(start, n_iterations):
            key, key_k = jax.random.split(key)
            ref = jit_sweep(
                sweep_keys(key_k),
                observations,
                inputs,
                init_state_mean,
                init_state_cov,
                ref,
            )
            states.append(ref[0])
            ivs.append(ref[1])
            stats.append(ref[2])
            if callback is not None:
                callback(k, ref)
            if checkpoint_path is not None and k % checkpoint_every == 0:
                ckpt.save(
                    checkpoint_path,
                    k,
                    key,
                    {"ref": ref, "states": states, "ivs": ivs,
                     "stats": stats},
                )
        states_kt = jnp.stack(states)
        iv_kt = tuple(jnp.stack([v[i] for v in ivs]) for i in range(n_gp))
        stats_k = tuple(
            jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *[s[i] for s in stats]
            )
            for i in range(n_gp)
        )
        if n_chains is None:
            return finalize(observations, inputs, states_kt, iv_kt, stats_k)
        # stacked shapes are (K, C, ...): map finalize over the chain axis
        return jax.vmap(
            finalize, in_axes=(None, None, 1, 1, 1)
        )(observations, inputs, states_kt, iv_kt, stats_k)

    return run_host
