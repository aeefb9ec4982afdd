"""Vehicle experiment: front/rear tire-friction identification.

Produces ``plots/Vehicle.mat`` with the same keys as
``/root/reference/VehicleSimulation_Simulation.py:105-155``.
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
from bipk_tpu.models import vehicle as veh
from bipk_tpu.utils import matio


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=200)
    p.add_argument("--gibbs-iters", type=int, default=800)
    p.add_argument("--t-end", type=float, default=30.0)
    p.add_argument("--quick", action="store_true")
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
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the online sweep "
                        "into DIR (compile excluded; view with "
                        "tensorboard/xprof)")
    p.add_argument("--out", default="plots/Vehicle.mat")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.quick:
        args.particles, args.gibbs_iters, args.t_end = 50, 20, 2.0

    cfg = veh.VehicleConfig(
        n_particles=args.particles,
        n_gibbs=args.gibbs_iters,
        t_end=args.t_end,
    )
    model = veh.make_model(cfg)
    key = jax.random.key(cfg.seed)

    key, key_sim = jax.random.split(key)
    X, Y, mu_f, mu_r, inputs = veh.simulate(key_sim, cfg, dtype=dtype)
    time = np.arange(0.0, cfg.t_end, cfg.dt)

    side_slip_all = jax.vmap(
        jax.vmap(veh.side_slip, in_axes=(0, None)), in_axes=(0, 0)
    )

    print("=== Online Algorithm ===")
    apf = jax.jit(
        build_apf(
            model.ssm, model.gps, cfg.n_particles,
            cfg.forgetting_factor, dtype=dtype,
        )
    )
    key, key_apf = jax.random.split(key)
    if args.profile:  # compile outside the trace, capture pure execution
        jax.block_until_ready(apf(key_apf, Y, inputs, model.x0, model.p0))
    from bipk_tpu.utils.profiling import profile_trace

    t0 = timelib.perf_counter()
    with profile_trace(args.profile):
        online = jax.block_until_ready(
            apf(key_apf, Y, inputs, model.x0, model.p0)
        )
    print(f"online sweep: {timelib.perf_counter() - t0:.2f}s")
    online_alpha_f, online_alpha_r = side_slip_all(online.states, inputs)

    print("=== Offline Algorithm ===")
    key, key_ref, key_traj = jax.random.split(key, 3)
    ref_run = apf(key_ref, Y, inputs, model.x0, model.p0)
    n_chains = max(1, args.chains)
    if n_chains > 1:
        # one weighted trajectory draw per chain
        refs = [
            matio.sample_reference_trajectory(k, ref_run)
            for k in jax.random.split(key_traj, n_chains)
        ]
        ref_state = jnp.stack([r[0] for r in refs])
        ref_iv = tuple(
            jnp.stack([r[1][i] for r in refs]) for i in range(len(model.gps))
        )
    else:
        ref_state, ref_iv = matio.sample_reference_trajectory(
            key_traj, ref_run
        )

    shard_mesh = chain_mesh = None
    if args.mesh and n_chains > 1:
        # chains are independent: shard the chain axis, not particles
        from bipk_tpu.parallel.mesh import chain_mesh as make_chain_mesh

        chain_mesh = make_chain_mesh(args.mesh)
    elif args.mesh:
        from bipk_tpu.parallel.mesh import particle_mesh

        shard_mesh = particle_mesh(args.mesh)
    # host-loop mode (see single_mass_oscillator.py for rationale)
    gibbs = build_gibbs(
        model.ssm, model.gps, cfg.n_particles, cfg.n_gibbs,
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

        for name, d in zip(
            ("mu_f", "mu_r"),
            diagnostics.gibbs_chain_summary(
                offline.int_vars, cfg.n_gibbs // 2
            ),
        ):
            if d["stuck"]:
                print(
                    f"  {name}: chains never moved — the conditional SMC "
                    f"is degenerate at this configuration; increase "
                    f"--particles"
                )
            else:
                print(
                    f"  {name}: R-hat {d['rhat']:.4f}, "
                    f"bulk ESS {d['ess']:.0f} of {d['n_draws']} draws"
                )
        # the .mat contract uses chain 0; draws are identically distributed
        offline = jax.tree_util.tree_map(lambda a: a[0], offline)
    offline_alpha_f, offline_alpha_r = side_slip_all(offline.states, inputs)

    # plotting grids (parity: VehicleSimulation_Simulation.py:99-102)
    alpha_plot = np.linspace(-20 / 180 * np.pi, 20 / 180 * np.pi, 500)
    mu_true_plot = np.asarray(jax.vmap(veh.mu_y_true)(jnp.asarray(alpha_plot)))
    basis_plot = np.asarray(
        jax.vmap(lambda a: model.basis.eigen_fn(a))(jnp.asarray(alpha_plot))
    )

    mdict = {
        **matio.offline_entries("offline", offline, gp_index=0, suffix="_f"),
        **matio.offline_entries("offline", offline, gp_index=1, suffix="_r"),
        "offline_Sigma_mu_f": offline.int_vars[0],
        "offline_Sigma_mu_r": offline.int_vars[1],
        "offline_Sigma_alpha_f": offline_alpha_f,
        "offline_Sigma_alpha_r": offline_alpha_r,
        **matio.online_entries("online", online, gp_index=0, suffix="_f"),
        **matio.online_entries("online", online, gp_index=1, suffix="_r"),
        "online_Sigma_mu_f": online.int_vars[0],
        "online_Sigma_mu_r": online.int_vars[1],
        "online_Sigma_alpha_f": online_alpha_f,
        "online_Sigma_alpha_r": online_alpha_r,
        **matio.prior_entries(model.gps[0].prior, suffix="_f"),
        **matio.prior_entries(model.gps[1].prior, suffix="_r"),
        "time": time,
        "alpha_plot": alpha_plot,
        "basis_plot": basis_plot,
        "mu_true_plot": mu_true_plot,
        "X": X,
        "Y": Y,
        "mu_f": mu_f,
        "mu_r": mu_r,
    }
    matio.save_mat(args.out, mdict)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
