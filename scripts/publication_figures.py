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
