"""EMPS experiment: friction identification on (real or surrogate) data.

Produces ``plots/EMPS.mat`` with the same keys as
``/root/reference/EMPS_Simulation.py:128-161``, including the classic-PGAS
baseline with a 729-function full-transition basis and the validation RMSE
on the pulse dataset.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time as timelib

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.algorithms import build_apf, build_gibbs, build_pgas
from bipk_tpu.models import emps
from bipk_tpu.ops import mniw
from bipk_tpu.ops.gaussian import mvn_logpdf_chol
from bipk_tpu.utils import matio


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=200)
    p.add_argument("--gibbs-iters", type=int, default=800)
    p.add_argument("--pgas-iters", type=int, default=None, help="default 3x gibbs")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--data-dir", default="data")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--chains", type=int, default=1, metavar="C",
                   help="run C independent Gibbs chains in one device "
                        "program and report cross-chain R-hat/ESS; each "
                        "chain starts from its own weighted draw out of "
                        "the APF population")
    p.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="crash-safe Gibbs checkpoint; resumes if it exists")
    p.add_argument("--checkpoint-every", type=int, default=50)
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="shard the Gibbs sampler's particle axis over an "
                        "N-device mesh (shard_map cSMC: fused kernels per "
                        "shard, exact global resampling); with --chains C > 1, "
                        "shards the chain axis instead (C/N chains "
                        "per device, zero collectives)")
    p.add_argument("--out", default="plots/EMPS.mat")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.quick:
        args.particles, args.gibbs_iters, args.max_steps = 50, 10, 150
        args.pgas_iters = 10
    if args.pgas_iters is None:
        args.pgas_iters = 3 * args.gibbs_iters

    cfg = emps.EMPSConfig(
        n_particles=args.particles, n_gibbs=args.gibbs_iters
    )
    model = emps.make_model(cfg, data_dir=args.data_dir)
    data = model.data
    if data.synthetic:
        print("NOTE: DATA_EMPS.mat absent; using linear-model surrogate data")
    if args.max_steps:
        data = data._replace(
            time=data.time[: args.max_steps],
            states=data.states[: args.max_steps],
            observations=data.observations[: args.max_steps],
            inputs=data.inputs[: args.max_steps],
        )
    Y = jnp.asarray(data.observations, dtype=dtype)
    inputs = jnp.asarray(data.inputs, dtype=dtype)
    key = jax.random.key(cfg.seed)

    print("=== Online Algorithm ===")
    apf = jax.jit(
        build_apf(
            model.ssm, (model.gp,), cfg.n_particles,
            cfg.forgetting_factor, dtype=dtype,
        )
    )
    key, key_apf = jax.random.split(key)
    t0 = timelib.perf_counter()
    online = jax.block_until_ready(apf(key_apf, Y, inputs, model.x0, model.p0))
    print(f"online sweep: {timelib.perf_counter() - t0:.2f}s")

    print("=== Offline Algorithm ===")
    key, key_ref, key_traj = jax.random.split(key, 3)
    ref_run = apf(key_ref, Y, inputs, model.x0, model.p0)
    n_chains = max(1, args.chains)
    if n_chains > 1:
        refs = [
            matio.sample_reference_trajectory(k, ref_run)
            for k in jax.random.split(key_traj, n_chains)
        ]
        ref_state = jnp.stack([r[0] for r in refs])
        ref_iv = (jnp.stack([r[1][0] for r in refs]),)
    else:
        ref_state, ref_iv = matio.sample_reference_trajectory(
            key_traj, ref_run
        )

    # host-loop mode: one device dispatch per sweep. The fully fused
    # scan-of-scans is a single multi-minute XLA execution, which exceeds
    # remote-TPU RPC deadlines at reference-scale iteration counts.
    shard_mesh = chain_mesh = None
    if args.mesh and n_chains > 1:
        # chains are independent: shard the chain axis, not particles
        from bipk_tpu.parallel.mesh import chain_mesh as make_chain_mesh

        chain_mesh = make_chain_mesh(args.mesh)
    elif args.mesh:
        from bipk_tpu.parallel.mesh import particle_mesh

        shard_mesh = particle_mesh(args.mesh)
    gibbs = build_gibbs(
        model.ssm, (model.gp,), cfg.n_particles, cfg.n_gibbs,
        dtype=dtype, fused=False, shard_mesh=shard_mesh,
        n_chains=n_chains if n_chains > 1 else None,
        chain_mesh=chain_mesh,
    )
    t0 = timelib.perf_counter()

    def progress(k, ref):
        if k % 100 == 0:
            print(f"  sweep {k}/{cfg.n_gibbs} "
                  f"({timelib.perf_counter() - t0:.1f}s)", flush=True)

    offline = jax.block_until_ready(
        gibbs(key, Y, inputs, model.x0, model.p0, ref_state, ref_iv,
              callback=progress,
              checkpoint_path=args.checkpoint,
              checkpoint_every=args.checkpoint_every)
    )
    print(
        f"{cfg.n_gibbs} Gibbs sweeps"
        + (f" x {n_chains} chains" if n_chains > 1 else "")
        + f": {timelib.perf_counter() - t0:.2f}s"
    )
    if n_chains > 1:
        from bipk_tpu.utils import diagnostics

        d = diagnostics.gibbs_chain_summary(
            offline.int_vars, cfg.n_gibbs // 2
        )[0]
        if d["stuck"]:
            print(
                "  friction F: chains never moved — the conditional SMC "
                "is degenerate at this configuration; increase --particles"
            )
        else:
            print(
                f"  friction F: R-hat {d['rhat']:.4f}, "
                f"bulk ESS {d['ess']:.0f} of {d['n_draws']} draws"
            )
        # the .mat contract uses chain 0; draws are identically distributed
        offline = jax.tree_util.tree_map(lambda a: a[0], offline)

    # posterior mean over Gibbs iterations
    # (parity: /root/reference/EMPS_Simulation.py:83-88)
    stats_avg = jax.tree_util.tree_map(
        lambda s: jnp.mean(s, axis=0), offline.stats[0]
    )
    offline_mean = mniw.posterior_mean(
        jax.tree_util.tree_map(
            lambda p, s: p + s, model.gp.prior_as(dtype), stats_avg
        )
    )

    mdict = {
        **matio.offline_entries("offline", offline),
        "offline_Sigma_F": offline.int_vars[0],
        **matio.online_entries("online", online),
        "online_Sigma_F": online.int_vars[0],
        **matio.prior_entries(model.gp.prior),
        "time": data.time,
        "Y": data.observations[:, 0],
        "X": data.states,
    }

    if not args.skip_baseline:
        print("=== Offline Algorithm (classic PGAS baseline) ===")
        out_chol = model.ssm.output_chol(dtype)
        # host-loop PGAS (one dispatch per sweep; not jit-wrapped)
        pgas = build_pgas(
            basis_fn=model.baseline_basis_fn,
            likelihood_fn=lambda obs, x, u: mvn_logpdf_chol(
                obs, x[:1], out_chol
            ),
            prior=model.baseline_prior,
            n_particles=cfg.n_particles,
            n_iterations=args.pgas_iters,
            dtype=dtype,
            fused=False,
        )
        key, key_pgas = jax.random.split(key)
        ref_full = jnp.asarray(data.states, dtype=dtype)
        t0 = timelib.perf_counter()
        baseline = jax.block_until_ready(
            pgas(key_pgas, Y, inputs, model.x0, model.p0, ref_full)
        )
        print(f"{args.pgas_iters} PGAS sweeps: {timelib.perf_counter() - t0:.2f}s")

        # baseline posterior coefficient mean from trajectory statistics
        # (parity: /root/reference/EMPS_Simulation.py:101-114). The summed
        # statistics are MXU matmuls (phi^T phi etc.) accumulated with a
        # scan over iterations — materializing per-step 729x729 outer
        # products for 400 iterations would exhaust HBM.
        def traj_stats(traj):
            phi = jax.vmap(model.baseline_basis_fn)(traj[:-1], inputs[:-1])
            y = traj[1:]
            return mniw.MNIW(
                phi.T @ y,
                phi.T @ phi,
                y.T @ y,
                jnp.asarray(y.shape[0], dtype=dtype),
            )

        k_iters = baseline.states.shape[1]

        def acc(carry, traj):
            st = traj_stats(traj)
            return jax.tree_util.tree_map(
                lambda c, s: c + s / k_iters, carry, st
            ), None

        n_base = model.config.n_basis_baseline
        zero = mniw.MNIW(
            jnp.zeros((n_base, 2), dtype),
            jnp.zeros((n_base, n_base), dtype),
            jnp.zeros((2, 2), dtype),
            jnp.asarray(0.0, dtype),
        )
        stats_base, _ = jax.jit(
            lambda trajs: jax.lax.scan(acc, zero, trajs)
        )(jnp.swapaxes(baseline.states, 0, 1))
        pgas_mean = mniw.posterior_mean(
            jax.tree_util.tree_map(
                lambda p, s: jnp.asarray(p, dtype=dtype) + s,
                model.baseline_prior,
                stats_base,
            )
        )

        val_data = emps.load_dataset(data_dir=args.data_dir, kind="pulses")
        rmse_alg2, rmse_pgas = emps.validation_rmse(
            model, offline_mean, pgas_mean, data=val_data
        )
        print(f"RMSE_Alg2: {rmse_alg2}")
        print(f"RMSE_PGAS: {rmse_pgas}")
        mdict.update(
            {
                "offline_Sigma_X_PGAS": baseline.states,
                "offline_log_likelihood_PGAS": baseline.log_likelihood,
                "RMSE_Alg2": rmse_alg2,
                "RMSE_PGAS": rmse_pgas,
            }
        )

    dq_plot = np.linspace(-0.15, 0.15, 500)
    mdict["dq_plot"] = dq_plot
    mdict["basis_plot"] = np.asarray(
        jax.vmap(lambda v: model.basis.eigen_fn(v))(jnp.asarray(dq_plot))
    )
    matio.save_mat(args.out, mdict)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
