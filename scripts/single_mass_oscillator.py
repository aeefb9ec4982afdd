"""Single-mass-oscillator experiment: online APF + offline PGAS.

Produces ``plots/SingleMassOscillator.mat`` with the same keys as
``/root/reference/SingleMassOscillator_Simulation.py:94-125`` so the
reference's figure script consumes it unchanged.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time as timelib

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.algorithms import build_apf, build_gibbs
from bipk_tpu.models import oscillator as smo
from bipk_tpu.utils import matio


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=200)
    p.add_argument("--gibbs-iters", type=int, default=800)
    p.add_argument("--t-end", type=float, default=15.0)
    p.add_argument("--quick", action="store_true", help="tiny smoke config")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
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
    p.add_argument("--plot-grid", type=int, default=50,
                   help="points per axis of the X_plot evaluation grid")
    p.add_argument("--out", default="plots/SingleMassOscillator.mat")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.quick:
        args.particles, args.gibbs_iters, args.t_end = 50, 20, 2.0

    cfg = smo.OscillatorConfig(
        n_particles=args.particles,
        n_gibbs=args.gibbs_iters,
        t_end=args.t_end,
    )
    model = smo.make_model(cfg)
    key = jax.random.key(cfg.seed)

    key, key_sim = jax.random.split(key)
    X, Y, F_sd, inputs = smo.simulate(key_sim, cfg, dtype=dtype)
    time = np.arange(0.0, cfg.t_end, cfg.dt)

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
                "  F_sd: chains never moved — the conditional SMC is "
                "degenerate at this configuration; increase --particles"
            )
        else:
            print(
                f"  F_sd: R-hat {d['rhat']:.4f}, "
                f"bulk ESS {d['ess']:.0f} of {d['n_draws']} draws"
            )
        # the .mat contract uses chain 0; draws are identically distributed
        offline = jax.tree_util.tree_map(lambda a: a[0], offline)

    # plotting grids (parity: SingleMassOscillator_Simulation.py:80-91)
    x_plt = np.linspace(-3.5, 3.5, args.plot_grid)
    dx_plt = np.linspace(-3.5, 3.5, args.plot_grid)
    grid_x, grid_y = np.meshgrid(x_plt, dx_plt, indexing="xy")
    X_plot = np.vstack([grid_x.flatten(), grid_y.flatten()]).T
    basis_plot = jax.vmap(model.basis.eigen_fn)(jnp.asarray(X_plot))
    F_sd_true_plot = np.asarray(
        jax.vmap(smo.spring_force)(jnp.asarray(X_plot[:, 0]))
        + jax.vmap(smo.damper_force)(jnp.asarray(X_plot[:, 1]))
    )

    mdict = {
        **matio.offline_entries("offline", offline),
        "offline_Sigma_F": offline.int_vars[0],
        **matio.online_entries("online", online),
        "online_Sigma_F": online.int_vars[0],
        **matio.prior_entries(model.gp.prior),
        "time": time,
        "X_plot": X_plot,
        "basis_plot": basis_plot,
        "F_sd_true_plot": F_sd_true_plot,
        "X": X,
        "Y": np.asarray(Y)[:, 0],
        "F_sd": np.asarray(F_sd)[:, 0],
    }
    matio.save_mat(args.out, mdict)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
