"""Toy experiment: 1-D blind system identification.

Mirrors ``/root/reference/Toy_Example_Simulation.py``: runs the online APF,
the marginalized PGAS (Algorithm 2), and the classic PGAS baseline, then
renders posterior-predictive function plots to ``plots/Toy_Example.pdf``
(the reference writes a PDF rather than a .mat; a .mat with the standard key
layout is saved as well for convenience).
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
from bipk_tpu.models import toy
from bipk_tpu.ops import mniw
from bipk_tpu.utils import matio, plotting


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=200)
    p.add_argument("--gibbs-iters", type=int, default=200)
    p.add_argument(
        "--chains",
        type=int,
        default=1,
        help="run C independent Gibbs chains in one device program and "
        "report cross-chain convergence diagnostics (split R-hat, "
        "rank-normalized R-hat, bulk ESS)",
    )
    p.add_argument("--quick", action="store_true")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--out", default="plots/Toy_Example")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.quick:
        args.particles, args.gibbs_iters = 50, 20

    cfg = toy.ToyConfig(
        n_particles=args.particles, n_gibbs=args.gibbs_iters
    )
    model = toy.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    X, Y = toy.simulate(key_sim, cfg, dtype=dtype)
    inputs = jnp.zeros((cfg.n_steps, 0), dtype=dtype)

    print("=== Online Algorithm ===")
    apf = jax.jit(
        build_apf(model.ssm, (model.gp,), cfg.n_particles, 1.0, dtype=dtype)
    )
    key, key_apf = jax.random.split(key)
    t0 = timelib.perf_counter()
    online = jax.block_until_ready(apf(key_apf, Y, inputs, model.x0, model.p0))
    print(f"online sweep: {timelib.perf_counter() - t0:.2f}s")

    print("=== Offline Algorithm ===")
    key, key_ref, key_traj = jax.random.split(key, 3)
    ref_run = apf(key_ref, Y, inputs, model.x0, model.p0)
    ref_state, ref_iv = matio.sample_reference_trajectory(key_traj, ref_run)
    n_chains = max(1, args.chains)
    gibbs = jax.jit(
        build_gibbs(
            model.ssm,
            (model.gp,),
            cfg.n_particles,
            cfg.n_gibbs,
            dtype=dtype,
            n_chains=n_chains if n_chains > 1 else None,
        )
    )
    key, key_g = jax.random.split(key)
    t0 = timelib.perf_counter()
    offline = jax.block_until_ready(
        gibbs(key_g, Y, inputs, model.x0, model.p0, ref_state, ref_iv)
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
                "chains never moved — the conditional SMC is degenerate "
                "at this configuration; increase --particles"
            )
        else:
            print(
                f"post-burn-in diagnostics over {n_chains} chains: "
                f"R-hat {d['rhat']:.4f}, bulk ESS {d['ess']:.0f} "
                f"of {d['n_draws']} draws"
            )
        # the .mat contract and plots use chain 0; cross-chain draws are
        # identically distributed
        offline = jax.tree_util.tree_map(lambda a: a[0], offline)

    print("=== Classic PGAS baseline ===")
    r_chol = model.ssm.output_chol(dtype)
    from bipk_tpu.ops.gaussian import mvn_logpdf_chol

    # host-loop mode: one dispatch per sweep (the fused scan-of-scans
    # compiles for minutes at reference-scale iteration counts)
    pgas = build_pgas(
        basis_fn=lambda x, u: model.basis.eigen_fn(x),
        likelihood_fn=lambda obs, x, u: mvn_logpdf_chol(obs, x, r_chol),
        prior=model.gp.prior,
        n_particles=cfg.n_particles,
        n_iterations=3 * cfg.n_gibbs,
        dtype=dtype,
        fused=False,
    )
    key, key_p = jax.random.split(key)
    t0 = timelib.perf_counter()
    baseline = jax.block_until_ready(
        pgas(key_p, Y, inputs, model.x0, model.p0, ref_state)
    )
    print(f"{3 * cfg.n_gibbs} PGAS sweeps: {timelib.perf_counter() - t0:.2f}s")

    # --- posterior predictive extraction on a grid ---
    x_plot = jnp.linspace(-30.0, 30.0, 601, dtype=dtype)
    phi_plot = jax.vmap(model.basis.eigen_fn)(x_plot[:, None])

    def predictive_curve(stats):
        post = jax.tree_util.tree_map(
            lambda p, s: p + s, model.gp.prior_as(dtype), stats
        )
        factor = mniw.factorize(post)
        pred = jax.vmap(lambda phi: mniw.factor_predictive(factor, phi))(
            phi_plot
        )
        mean = pred.mean[:, 0]
        df = pred.df
        var = (
            pred.col_scale
            * pred.row_scale[:, 0, 0]
            * jnp.where(df > 2, df / (df - 2.0), jnp.inf)
        )
        return mean, jnp.sqrt(var)

    half = cfg.n_gibbs // 2
    offline_stats = jax.tree_util.tree_map(
        lambda s: jnp.mean(s[half:], axis=0), offline.stats[0]
    )
    mean_off, std_off = predictive_curve(offline_stats)
    online_stats = jax.tree_util.tree_map(
        lambda s: s[-1], online.stats_mean[0]
    )
    mean_on, std_on = predictive_curve(online_stats)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    truth = toy.f_true(x_plot)
    plotting.plot_fcn_error_1d(
        x_plot, mean_off, std_off, truth, data_x=X, ax=axes[0],
        label="offline (Alg 2)",
    )
    plotting.plot_fcn_error_1d(
        x_plot, mean_on, std_on, truth, data_x=X, ax=axes[1],
        label="online (Alg 1)",
    )
    plotting.apply_basic_formatting(fig, width=24, height=10)
    fig.savefig(args.out + ".pdf")
    print(f"saved {args.out}.pdf")

    mdict = {
        **matio.offline_entries("offline", offline),
        "offline_Sigma_F": offline.int_vars[0],
        **matio.online_entries("online", online),
        "online_Sigma_F": online.int_vars[0],
        **matio.prior_entries(model.gp.prior),
        "baseline_Sigma_X": baseline.states,
        "baseline_log_likelihood": baseline.log_likelihood,
        "x_plot": x_plot,
        "f_true_plot": truth,
        "X": X,
        "Y": Y,
    }
    matio.save_mat(args.out + ".mat", mdict)
    print(f"saved {args.out}.mat")


if __name__ == "__main__":
    main()
