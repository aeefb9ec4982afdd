"""Publication plotting utilities.

Capability parity with ``/root/reference/src/Publication_Plotting.py``:
weighted particle time-series plots with ±3σ bands, 1-D/2-D function-error
panels with data-density histograms, weighted RMSE, and shared figure
formatting. Rendering is host-side matplotlib; all reductions are numpy.
"""

from __future__ import annotations

import numpy as np

IMES_BLUE = np.array([0.0, 80.0, 155.0]) / 255.0
IMES_ORANGE = np.array([231.0, 123.0, 41.0]) / 255.0
IMES_GREEN = np.array([200.0, 211.0, 23.0]) / 255.0


def weighted_moments(samples: np.ndarray, weights: np.ndarray):
    """Weighted mean and std over the particle axis.

    ``samples (T, N)`` or ``(T, N, d)``, ``weights (T, N)``.
    """
    samples = np.asarray(samples)
    weights = np.asarray(weights)
    if samples.ndim == 2:
        samples = samples[..., None]
    mean = np.einsum("tn,tnd->td", weights, samples)
    var = np.einsum("tn,tnd->td", weights, (samples - mean[:, None, :]) ** 2)
    return mean, np.sqrt(np.maximum(var, 0.0))


def calc_wrmse(weights: np.ndarray, values: np.ndarray, truth: np.ndarray):
    """Precision-weighted RMSE over a grid
    (parity: /root/reference/src/Publication_Plotting.py:203-211)."""
    err2 = (np.asarray(values) - np.asarray(truth)[:, None]) ** 2
    w = np.asarray(weights)
    w = w / np.sum(w, axis=0, keepdims=True)
    return np.sqrt(np.einsum("gk,gk->k", w, err2))


def plot_data(time, samples, weights, truth=None, labels=None, ax=None):
    """Weighted mean ±3σ particle time series
    (parity: /root/reference/src/Publication_Plotting.py:45-76)."""
    import matplotlib.pyplot as plt

    mean, std = weighted_moments(samples, weights)
    d = mean.shape[1]
    if ax is None:
        _, axes = plt.subplots(d, 1, squeeze=False)
        axes = axes[:, 0]
    else:
        axes = np.atleast_1d(ax)
    for i in range(d):
        axes[i].fill_between(
            time,
            mean[:, i] - 3 * std[:, i],
            mean[:, i] + 3 * std[:, i],
            color=IMES_BLUE,
            alpha=0.25,
            label="±3σ",
        )
        axes[i].plot(time, mean[:, i], color=IMES_BLUE, label="mean")
        if truth is not None:
            axes[i].plot(
                time,
                np.atleast_2d(np.asarray(truth).T).T[:, i],
                color=IMES_ORANGE,
                ls="--",
                label="truth",
            )
        if labels:
            axes[i].set_ylabel(labels[i])
    axes[-1].set_xlabel("time")
    axes[0].legend(loc="best", fontsize=8)
    return axes


def plot_fcn_error_1d(
    x_grid, mean, std, truth, data_x=None, ax=None, label="f(x)"
):
    """1-D learned-function error panel with data histogram
    (parity: /root/reference/src/Publication_Plotting.py:171-200)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    x_grid = np.asarray(x_grid)
    ax.fill_between(
        x_grid,
        np.asarray(mean) - 3 * np.asarray(std),
        np.asarray(mean) + 3 * np.asarray(std),
        color=IMES_BLUE,
        alpha=0.25,
    )
    ax.plot(x_grid, mean, color=IMES_BLUE, label="posterior mean")
    ax.plot(x_grid, truth, color=IMES_ORANGE, ls="--", label="truth")
    if data_x is not None:
        twin = ax.twinx()
        twin.hist(
            np.asarray(data_x).ravel(),
            bins=40,
            color=IMES_GREEN,
            alpha=0.3,
            density=True,
        )
        twin.set_yticks([])
    ax.set_ylabel(label)
    ax.legend(loc="best", fontsize=8)
    return ax


def plot_fcn_error_2d(
    grid_xy, mean, truth, std=None, data_xy=None, ax=None
):
    """2-D learned-function |error| heatmap with variance-based alpha
    (parity: /root/reference/src/Publication_Plotting.py:99-168)."""
    import matplotlib.pyplot as plt
    import matplotlib.tri as tri

    if ax is None:
        _, ax = plt.subplots()
    grid_xy = np.asarray(grid_xy)
    err = np.abs(np.asarray(mean) - np.asarray(truth))
    triang = tri.Triangulation(grid_xy[:, 0], grid_xy[:, 1])
    cs = ax.tripcolor(triang, err, cmap="viridis", shading="gouraud")
    if data_xy is not None:
        ax.plot(
            np.asarray(data_xy)[:, 0],
            np.asarray(data_xy)[:, 1],
            ".",
            ms=1,
            color="white",
            alpha=0.3,
        )
    plt.colorbar(cs, ax=ax, label="|error|")
    return ax


def apply_basic_formatting(fig, width=10.0, height=6.0, font_size=9):
    """Shared figure formatting
    (parity: /root/reference/src/Publication_Plotting.py feel, sans LaTeX
    so figures render in minimal environments)."""
    fig.set_size_inches(width / 2.54, height / 2.54)
    for ax in fig.get_axes():
        ax.grid(True, which="both", alpha=0.3)
        for item in (
            [ax.title, ax.xaxis.label, ax.yaxis.label]
            + ax.get_xticklabels()
            + ax.get_yticklabels()
        ):
            item.set_fontsize(font_size)
    fig.tight_layout()
