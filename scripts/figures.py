"""Render result figures from the .mat files the experiment scripts write.

Capability parity with the reference's ``*_Figures.py`` family
(``/root/reference/SingleMassOscillator_Figures.py`` etc.): reconstruct the
GP posterior per Gibbs iteration / time step from the stored natural
parameters, evaluate the matrix-t predictive on the stored plot grids, and
render state/function/wRMSE panels to ``plots/*.pdf``. Because the .mat key
layout matches the reference exactly, the reference's own figure scripts
also consume these files unchanged.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from bipk_tpu.ops import mniw
from bipk_tpu.utils import plotting


def running_mean_posteriors(prior, T0, T1, T2, T3):
    """Running mean of offline statistics over Gibbs iterations.

    Parity: ``/root/reference/SingleMassOscillator_Figures.py:58-73`` —
    ``prior + cumsum(T_i)/arange`` per iteration. Stat arrays carry the
    iteration axis first (``T0 (K, m, n)`` ... ``T3 (K,)``).
    """

    def runmean(prior_i, stat):
        stat = np.asarray(stat)
        k = np.arange(1, stat.shape[0] + 1).reshape(
            (-1,) + (1,) * (stat.ndim - 1)
        )
        return jnp.asarray(np.asarray(prior_i) + np.cumsum(stat, axis=0) / k)

    return mniw.MNIW(
        runmean(prior[0], T0),
        runmean(prior[1], T1),
        runmean(prior[2], T2),
        runmean(prior[3].ravel()[0], np.ravel(T3)),
    )


def predictive_on_grid(nat: mniw.MNIW, basis_grid: np.ndarray):
    """Posterior-predictive mean/std on a grid of basis vectors."""
    factor = mniw.factorize(nat)
    pred = jax.vmap(lambda phi: mniw.factor_predictive(factor, phi))(
        jnp.asarray(basis_grid)
    )
    mean = np.asarray(pred.mean)[:, 0]
    df = np.asarray(pred.df)
    var = (
        np.asarray(pred.col_scale)
        * np.asarray(pred.row_scale)[:, 0, 0]
        * np.where(df > 2, df / (df - 2.0), np.inf)
    )
    return mean, np.sqrt(var)


def predictive_series_on_grid(nats: mniw.MNIW, basis_grid: np.ndarray):
    """Posterior-predictive mean/var on a grid for a SERIES of posteriors
    (iteration axis first) — feeds the reference's wRMSE-vs-iteration
    curve (/root/reference/SingleMassOscillator_Figures.py:190-213)."""
    basis = jnp.asarray(basis_grid)

    def one(nat):
        factor = mniw.factorize(nat)
        pred = jax.vmap(lambda phi: mniw.factor_predictive(factor, phi))(
            basis
        )
        df = pred.df
        var = (
            pred.col_scale
            * pred.row_scale[:, 0, 0]
            * jnp.where(df > 2, df / (df - 2.0), jnp.inf)
        )
        return pred.mean[:, 0], var

    mean, var = jax.lax.map(one, nats)
    return np.asarray(mean), np.asarray(var)


def _final_offline_posterior(data, prior_keys, stat_keys):
    prior = [data[k] for k in prior_keys]
    stats = [np.mean(data[k], axis=0) for k in stat_keys]
    return mniw.MNIW(
        jnp.asarray(prior[0] + stats[0]),
        jnp.asarray(prior[1] + stats[1]),
        jnp.asarray(prior[2] + stats[2]),
        jnp.asarray(prior[3].ravel()[0] + stats[3].ravel()[0]
                    if np.ndim(stats[3]) else prior[3].ravel()[0] + stats[3]),
    )


def figure_oscillator(data, outdir):
    paths = []
    # --- final-posterior function-error panel at reference fidelity:
    # variance-alpha tripcolor + weighted data-density marginals
    # (parity: /root/reference/SingleMassOscillator_Figures.py:140-188)
    post = _final_offline_posterior(
        data,
        ["prior_T0", "prior_T1", "prior_T2", "prior_T3"],
        ["offline_T0", "offline_T1", "offline_T2", "offline_T3"],
    )
    mean, std = predictive_on_grid(post, data["basis_plot"])
    truth = data["F_sd_true_plot"].ravel()

    fig, ax, ax_histx, ax_histy, cax = plotting.fcn_error_grid_axes()
    plotting.plot_fcn_error_2d(
        data["X_plot"], mean, truth, std=std,
        data_xy=data["offline_Sigma_X"],
        data_weights=data["offline_weights"],
        ax=ax, ax_histx=ax_histx, ax_histy=ax_histy, cax=cax,
        vmin=1e-1, norm="log",
    )
    ax.set_xlabel("s in m")
    ax.set_ylabel("ds/dt in m/s")
    path = os.path.join(outdir, "SingleMassOscillator_fcn_error.pdf")
    plotting.apply_basic_formatting(fig, width=12, height=12)
    fig.savefig(path)
    paths.append(path)

    # --- wRMSE over Gibbs iterations (parity:
    # /root/reference/SingleMassOscillator_Figures.py:190-213)
    nats = running_mean_posteriors(
        (data["prior_T0"], data["prior_T1"], data["prior_T2"],
         data["prior_T3"]),
        data["offline_T0"], data["offline_T1"], data["offline_T2"],
        data["offline_T3"],
    )
    mean_it, var_it = predictive_series_on_grid(nats, data["basis_plot"])
    wrmse = plotting.calc_wrmse_precision(mean_it, var_it, truth)
    figr, axr = plt.subplots(1, 1, layout="tight")
    plotting.plot_wrmse_curve(wrmse, ax=axr, ylabel="wRMSE in N")
    plotting.apply_basic_formatting(figr, width=12, height=9)
    pr = os.path.join(outdir, "SingleMassOscillator_wRMSE.pdf")
    figr.savefig(pr)
    paths.append(pr)

    # --- state estimate panel
    fig2, ax2 = plt.subplots(1, 1, figsize=(6, 4))
    plotting.plot_data(
        data["time"].ravel(),
        data["offline_Sigma_X"][:, :, 0],
        data["offline_weights"],
        truth=data["X"][:, 0],
        ax=np.atleast_1d(ax2),
    )
    ax2.set_title(f"position draws (final wRMSE {wrmse[-1]:.2f} N)")
    plotting.apply_basic_formatting(fig2, width=14, height=11)
    p2 = os.path.join(outdir, "SingleMassOscillator_fig.pdf")
    fig2.savefig(p2)
    paths.append(p2)
    return paths


def figure_vehicle(data, outdir):
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    figr, axr = plt.subplots(1, 2, figsize=(11, 4))
    truth = data["mu_true_plot"].ravel()
    for i, (sfx, label) in enumerate((("_f", "front"), ("_r", "rear"))):
        post = _final_offline_posterior(
            data,
            [f"prior_T0{sfx}", f"prior_T1{sfx}", f"prior_T2{sfx}", f"prior_T3{sfx}"],
            [f"offline_T0{sfx}", f"offline_T1{sfx}", f"offline_T2{sfx}", f"offline_T3{sfx}"],
        )
        mean, std = predictive_on_grid(post, data["basis_plot"])
        plotting.plot_fcn_error_1d(
            data["alpha_plot"].ravel(),
            mean,
            std,
            truth,
            data_x=data[f"offline_Sigma_alpha{sfx}"],
            ax=axes[i],
            label=f"mu_y {label}",
        )
        # wRMSE over Gibbs iterations per axle (parity with the
        # reference's per-function wRMSE curves)
        nats = running_mean_posteriors(
            (data[f"prior_T0{sfx}"], data[f"prior_T1{sfx}"],
             data[f"prior_T2{sfx}"], data[f"prior_T3{sfx}"]),
            data[f"offline_T0{sfx}"], data[f"offline_T1{sfx}"],
            data[f"offline_T2{sfx}"], data[f"offline_T3{sfx}"],
        )
        mean_it, var_it = predictive_series_on_grid(
            nats, data["basis_plot"]
        )
        wrmse = plotting.calc_wrmse_precision(mean_it, var_it, truth)
        plotting.plot_wrmse_curve(
            wrmse, ax=axr[i], ylabel=f"wRMSE mu_y {label}"
        )
    plotting.apply_basic_formatting(fig, width=28, height=11)
    path = os.path.join(outdir, "Vehicle_fig.pdf")
    fig.savefig(path)
    plotting.apply_basic_formatting(figr, width=28, height=11)
    figr.savefig(os.path.join(outdir, "Vehicle_wRMSE.pdf"))
    return path


def figure_emps(data, outdir):
    post = _final_offline_posterior(
        data,
        ["prior_T0", "prior_T1", "prior_T2", "prior_T3"],
        ["offline_T0", "offline_T1", "offline_T2", "offline_T3"],
    )
    mean, std = predictive_on_grid(post, data["basis_plot"])
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].fill_between(
        data["dq_plot"].ravel(), mean - 3 * std, mean + 3 * std,
        alpha=0.25, color=plotting.IMES_BLUE,
    )
    axes[0].plot(data["dq_plot"].ravel(), mean, color=plotting.IMES_BLUE)
    axes[0].set_xlabel("dq")
    axes[0].set_ylabel("friction F(dq)")

    # posterior-uncertainty trace over Gibbs iterations (EMPS has no
    # ground-truth friction curve; the reference tracks the posterior
    # mean's evolution instead)
    nats = running_mean_posteriors(
        (data["prior_T0"], data["prior_T1"], data["prior_T2"],
         data["prior_T3"]),
        data["offline_T0"], data["offline_T1"], data["offline_T2"],
        data["offline_T3"],
    )
    mean_it, var_it = predictive_series_on_grid(nats, data["basis_plot"])
    drift = plotting.calc_wrmse_precision(mean_it, var_it, mean_it[-1])
    figr, axr = plt.subplots(1, 1, layout="tight")
    plotting.plot_wrmse_curve(
        drift, ax=axr, ylabel="wRMSE to final posterior"
    )
    plotting.apply_basic_formatting(figr, width=12, height=9)
    figr.savefig(os.path.join(outdir, "EMPS_wRMSE.pdf"))
    plotting.plot_data(
        data["time"].ravel(),
        data["offline_Sigma_X"][:, :, 0],
        data["offline_weights"],
        truth=data["Y"].ravel(),
        ax=np.atleast_1d(axes[1]),
    )
    plotting.apply_basic_formatting(fig, width=28, height=11)
    path = os.path.join(outdir, "EMPS_fig.pdf")
    fig.savefig(path)
    return path


RENDERERS = {
    "SingleMassOscillator": figure_oscillator,
    "Vehicle": figure_vehicle,
    "EMPS": figure_emps,
}


def main():
    import scipy.io

    p = argparse.ArgumentParser()
    p.add_argument("matfile", help="plots/{SingleMassOscillator,Vehicle,EMPS}.mat")
    p.add_argument("--outdir", default="plots")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    name = os.path.splitext(os.path.basename(args.matfile))[0]
    if name not in RENDERERS:
        raise SystemExit(f"unknown result file {name}; choices: {list(RENDERERS)}")
    data = scipy.io.loadmat(args.matfile)
    path = RENDERERS[name](data, args.outdir)
    paths = path if isinstance(path, list) else [path]
    print(f"saved {', '.join(paths)}")


if __name__ == "__main__":
    main()
