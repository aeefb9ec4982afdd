"""Composite publication figure from all example result files.

Capability parity with ``/root/reference/Publication_Figures.py``: composes
the oscillator, vehicle, and EMPS results into multi-panel offline/online
comparison figures. Consumes the same ``.mat`` files the experiment scripts
write (run those first).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")

import jax
import matplotlib.pyplot as plt
import numpy as np

from bipk_tpu.ops import mniw
from bipk_tpu.utils import plotting

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from figures import _final_offline_posterior, predictive_on_grid  # noqa: E402


def _online_posterior(data, prior_keys, stat_keys, t=-1, suffix=""):
    """Posterior at a single online time step (direct stats, parity:
    /root/reference/SingleMassOscillator_Figures.py:77-84)."""
    prior = [data[k] for k in prior_keys]
    stats = [data[k][t] for k in stat_keys]
    return mniw.MNIW(
        np.asarray(prior[0] + stats[0]),
        np.asarray(prior[1] + stats[1]),
        np.asarray(prior[2] + stats[2]),
        np.asarray(prior[3].ravel()[0] + np.ravel(stats[3])[0]),
    )


def _traj_panel(axes, time, sigma_x, sigma_iv, weights, truth_states,
                truth_iv, ylabels, title):
    """One example column of the reference's 3x3 trajectory figure
    (parity: /root/reference/Publication_Figures.py:420-540): the state
    components + the interface variable as weighted mean +-3 sigma."""
    states = np.concatenate(
        [np.atleast_3d(sigma_x), np.atleast_3d(sigma_iv)], axis=-1
    )
    truth = None
    if truth_states is not None and truth_iv is not None:
        truth = np.concatenate(
            [np.atleast_2d(truth_states.T).T,
             np.asarray(truth_iv).reshape(len(time), -1)], axis=-1
        )
    for i, ax in enumerate(axes):
        plotting.plot_data(
            time, states[..., i], weights,
            truth=None if truth is None else truth[:, i],
            ax=np.atleast_1d(ax),
        )
        ax.set_ylabel(ylabels[i])
        ax.set_xlim(time.min(), time.max())
        if i < len(axes) - 1:
            ax.tick_params(axis="x", bottom=False, labelbottom=False)
    axes[0].set_title(title)
    axes[-1].set_xlabel("Time in s")


def render_traj_figure(mode, datas, out_path):
    """The reference's results_traj_{offline,online}.pdf: one column per
    example, rows = two states + the learned interface variable."""
    fig = plt.figure(dpi=150)
    gs = fig.add_gridspec(3, 3)
    cols = []
    if "smo" in datas:
        d = datas["smo"]
        axes = [fig.add_subplot(gs[i, len(cols)]) for i in range(3)]
        _traj_panel(
            axes, d["time"].ravel(),
            d[f"{mode}_Sigma_X"], d[f"{mode}_Sigma_F"],
            d[f"{mode}_weights"],
            d["X"], d["F_sd"].ravel(),
            ["s in m", "ds/dt in m/s", "F in N"],
            "Nonlinear Oscillator",
        )
        cols.append("smo")
    if "veh" in datas:
        d = datas["veh"]
        axes = [fig.add_subplot(gs[i, len(cols)]) for i in range(3)]
        _traj_panel(
            axes, d["time"].ravel(),
            d[f"{mode}_Sigma_X"], d[f"{mode}_Sigma_mu_f"],
            d[f"{mode}_weights"],
            d["X"], d["mu_f"].ravel() if "mu_f" in d else None,
            ["dpsi in rad/s", "v_y in m/s", "mu_f"],
            "Vehicle",
        )
        cols.append("veh")
    if "emps" in datas:
        d = datas["emps"]
        axes = [fig.add_subplot(gs[i, len(cols)]) for i in range(3)]
        _traj_panel(
            axes, d["time"].ravel(),
            d[f"{mode}_Sigma_X"], d[f"{mode}_Sigma_F"],
            d[f"{mode}_weights"],
            None, None,
            ["q in m", "dq in m/s", "F friction"],
            "Real-world Positioning System",
        )
        cols.append("emps")
    fig.set_layout_engine("tight")
    plotting.apply_basic_formatting(fig, width=40, height=24)
    fig.savefig(out_path)
    return cols


def render_fcn_figure(mode, datas, out_path):
    """The reference's results_fcn_{offline,online}.pdf: SMO 2-D error
    panel with marginal histograms + colorbar, vehicle and EMPS 1-D
    function panels with data histograms
    (parity: /root/reference/Publication_Figures.py:347-693)."""
    import matplotlib.gridspec

    fig = plt.figure(dpi=150)
    gs = matplotlib.gridspec.GridSpec(1, 3, figure=fig)

    def posterior(d, pk, keys):
        if mode == "offline":
            return _final_offline_posterior(d, pk, keys)
        return _online_posterior(d, pk, keys)

    if "smo" in datas:
        d = datas["smo"]
        g0 = matplotlib.gridspec.GridSpecFromSubplotSpec(
            2, 3, width_ratios=(5, 1, 0.2), height_ratios=(1, 5),
            hspace=0.05, wspace=0.05, subplot_spec=gs[0, 0],
        )
        ax = fig.add_subplot(g0[1, 0])
        ax_hx = fig.add_subplot(g0[0, 0], sharex=ax)
        ax_hy = fig.add_subplot(g0[1, 1], sharey=ax)
        cax = fig.add_subplot(g0[1, 2])
        post = posterior(
            d, ["prior_T0", "prior_T1", "prior_T2", "prior_T3"],
            [f"{mode}_T0", f"{mode}_T1", f"{mode}_T2", f"{mode}_T3"],
        )
        mean, std = predictive_on_grid(post, d["basis_plot"])
        plotting.plot_fcn_error_2d(
            d["X_plot"], mean, d["F_sd_true_plot"].ravel(), std=std,
            data_xy=d[f"{mode}_Sigma_X"], data_weights=d[f"{mode}_weights"],
            ax=ax, ax_histx=ax_hx, ax_histy=ax_hy, cax=cax, vmin=1e-1,
        )
        ax_hx.set_title("Nonlinear Oscillator")
        ax.set_xlabel("s in m")
        ax.set_ylabel("ds/dt in m/s")

    def fcn_1d(col, d, pk, keys, x_key, truth, hist_x, title, xlabel):
        g = matplotlib.gridspec.GridSpecFromSubplotSpec(
            2, 1, height_ratios=(1, 5), hspace=0.05, wspace=0.05,
            subplot_spec=gs[0, col],
        )
        ax = fig.add_subplot(g[1, 0])
        ax_hx = fig.add_subplot(g[0, 0], sharex=ax)
        post = posterior(d, pk, keys)
        mean, std = predictive_on_grid(post, d["basis_plot"])
        plotting.plot_fcn_error_1d(
            d[x_key].ravel(), mean, std, truth, ax=ax, label=xlabel,
        )
        ax_hx.hist(
            np.asarray(hist_x).ravel(), bins=100, color=plotting.IMES_BLUE,
        )
        ax_hx.tick_params(axis="x", bottom=False, labelbottom=False)
        ax_hx.set_title(title)
        ax.set_xlabel(xlabel)

    if "veh" in datas:
        d = datas["veh"]
        fcn_1d(
            1, d,
            ["prior_T0_f", "prior_T1_f", "prior_T2_f", "prior_T3_f"],
            [f"{mode}_T0_f", f"{mode}_T1_f", f"{mode}_T2_f",
             f"{mode}_T3_f"],
            "alpha_plot", d["mu_true_plot"].ravel(),
            d[f"{mode}_Sigma_alpha_f"], "Vehicle", "alpha_f in rad",
        )
    if "emps" in datas:
        d = datas["emps"]
        fcn_1d(
            2, d,
            ["prior_T0", "prior_T1", "prior_T2", "prior_T3"],
            [f"{mode}_T0", f"{mode}_T1", f"{mode}_T2", f"{mode}_T3"],
            "dq_plot", None,
            d[f"{mode}_Sigma_X"][..., 1]
            if np.asarray(d[f"{mode}_Sigma_X"]).ndim == 3
            else d[f"{mode}_Sigma_X"],
            "Real-world Positioning System", "dq in m/s",
        )
    plotting.apply_basic_formatting(fig, width=40, height=14)
    fig.savefig(out_path)


def main():
    import scipy.io

    p = argparse.ArgumentParser()
    p.add_argument("--plots-dir", default="plots")
    p.add_argument("--out", default="plots/Publication_Figure.pdf")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    panels = []
    smo_path = os.path.join(args.plots_dir, "SingleMassOscillator.mat")
    veh_path = os.path.join(args.plots_dir, "Vehicle.mat")
    emps_path = os.path.join(args.plots_dir, "EMPS.mat")

    # the reference's four publication files: per-mode trajectory and
    # function figures across all available examples
    datas = {}
    if os.path.exists(smo_path):
        datas["smo"] = scipy.io.loadmat(smo_path)
    if os.path.exists(veh_path):
        datas["veh"] = scipy.io.loadmat(veh_path)
    if os.path.exists(emps_path):
        datas["emps"] = scipy.io.loadmat(emps_path)
    outdir = os.path.dirname(args.out) or args.plots_dir
    os.makedirs(outdir, exist_ok=True)
    if datas:
        for mode in ("offline", "online"):
            render_traj_figure(
                mode, datas,
                os.path.join(outdir, f"results_traj_{mode}.pdf"),
            )
            render_fcn_figure(
                mode, datas,
                os.path.join(outdir, f"results_fcn_{mode}.pdf"),
            )
        print(
            "saved results_{traj,fcn}_{offline,online}.pdf "
            f"({', '.join(datas)})"
        )

    fig, axes = plt.subplots(2, 3, figsize=(16, 8))

    if os.path.exists(smo_path):
        d = scipy.io.loadmat(smo_path)
        for row, mode in enumerate(["offline", "online"]):
            if mode == "offline":
                post = _final_offline_posterior(
                    d,
                    ["prior_T0", "prior_T1", "prior_T2", "prior_T3"],
                    ["offline_T0", "offline_T1", "offline_T2", "offline_T3"],
                )
            else:
                post = _online_posterior(
                    d,
                    ["prior_T0", "prior_T1", "prior_T2", "prior_T3"],
                    ["online_T0", "online_T1", "online_T2", "online_T3"],
                )
            mean, _ = predictive_on_grid(post, d["basis_plot"])
            truth = d["F_sd_true_plot"].ravel()
            wrmse = np.sqrt(np.mean((mean - truth) ** 2))
            ax = axes[row, 0]
            plotting.plot_fcn_error_2d(d["X_plot"], mean, truth, ax=ax)
            ax.set_title(f"SMO {mode}: F_sd error (RMSE {wrmse:.2f})")
        panels.append("SMO")

    if os.path.exists(veh_path):
        d = scipy.io.loadmat(veh_path)
        for row, mode in enumerate(["offline", "online"]):
            ax = axes[row, 1]
            for sfx, label in (("_f", "front"), ("_r", "rear")):
                keys = [f"{mode}_T0{sfx}", f"{mode}_T1{sfx}",
                        f"{mode}_T2{sfx}", f"{mode}_T3{sfx}"]
                pk = [f"prior_T0{sfx}", f"prior_T1{sfx}",
                      f"prior_T2{sfx}", f"prior_T3{sfx}"]
                if mode == "offline":
                    post = _final_offline_posterior(d, pk, keys)
                else:
                    post = _online_posterior(d, pk, keys)
                mean, std = predictive_on_grid(post, d["basis_plot"])
                a = d["alpha_plot"].ravel()
                ax.plot(a, mean, label=f"{label} mean")
                ax.fill_between(a, mean - 3 * std, mean + 3 * std, alpha=0.15)
            ax.plot(
                d["alpha_plot"].ravel(), d["mu_true_plot"].ravel(),
                "k--", label="truth",
            )
            ax.set_title(f"vehicle {mode}: mu_y")
            ax.legend(fontsize=7)
        panels.append("vehicle")

    if os.path.exists(emps_path):
        d = scipy.io.loadmat(emps_path)
        for row, mode in enumerate(["offline", "online"]):
            keys = [f"{mode}_T0", f"{mode}_T1", f"{mode}_T2", f"{mode}_T3"]
            pk = ["prior_T0", "prior_T1", "prior_T2", "prior_T3"]
            if mode == "offline":
                post = _final_offline_posterior(d, pk, keys)
            else:
                post = _online_posterior(d, pk, keys)
            mean, std = predictive_on_grid(post, d["basis_plot"])
            ax = axes[row, 2]
            dq = d["dq_plot"].ravel()
            ax.plot(dq, mean)
            ax.fill_between(dq, mean - 3 * std, mean + 3 * std, alpha=0.2)
            ax.set_title(f"EMPS {mode}: friction F(dq)")
        panels.append("EMPS")

    if not panels:
        raise SystemExit("no .mat result files found; run the experiment scripts first")

    plotting.apply_basic_formatting(fig, width=40, height=20)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out)
    print(f"saved {args.out} ({', '.join(panels)})")


if __name__ == "__main__":
    main()
