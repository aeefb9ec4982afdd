""".mat result-file contract.

The reference decouples simulation from plotting through ``scipy.io.savemat``
dictionaries (e.g. ``/root/reference/SingleMassOscillator_Simulation.py:
94-125``); keeping the same keys lets the reference's ``*_Figures.py``
scripts consume results produced here unchanged.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from bipk_tpu.ops import resampling


def sample_reference_trajectory(key, apf_result):
    """Draw one ancestral trajectory from an APF run to seed PGAS.

    Deviation note: the reference draws the index with
    ``searchsorted(cumsum(weights_trace_2d), u)`` over the *flattened*
    ``(T, N)`` weight trace (e.g. ``/root/reference/
    SingleMassOscillator_Simulation.py:55``), which lands in the first
    (uniform) row — an effectively uniform index. Here the index is drawn
    from the final-time weights, the statistically intended choice.
    """
    idx = resampling.categorical_from_weights(key, apf_result.weights[-1])
    (state_traj, iv_traj), _ = resampling.reconstruct_trajectory(
        (apf_result.states, apf_result.int_vars), apf_result.ancestors, idx
    )
    return state_traj, iv_traj


def to_host(tree):
    """Device pytree -> numpy pytree for scipy.io.savemat."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_mat(path: str, mdict: dict) -> None:
    import scipy.io

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    scipy.io.savemat(path, {k: np.asarray(v) for k, v in mdict.items()})


def online_entries(prefix: str, apf_result, gp_index: int = 0, suffix: str = ""):
    """Standard online-algorithm keys shared by the example scripts.

    Key set parity: ``/root/reference/SingleMassOscillator_Simulation.py:
    104-112`` (``online_*``) and the two-GP vehicle variant with ``_f``/
    ``_r`` suffixes.
    """
    stats = apf_result.stats_mean[gp_index]
    return {
        f"{prefix}_Sigma_X": apf_result.states,
        f"{prefix}_Sigma_Y": apf_result.outputs,
        f"{prefix}_weights": apf_result.weights,
        f"{prefix}_log_likelihood": apf_result.log_likelihood,
        f"{prefix}_T0{suffix}": stats.T0,
        f"{prefix}_T1{suffix}": stats.T1,
        f"{prefix}_T2{suffix}": stats.T2,
        f"{prefix}_T3{suffix}": stats.T3,
    }


def offline_entries(prefix: str, gibbs_result, gp_index: int = 0, suffix: str = ""):
    """Standard offline-algorithm (Algorithm 2) keys."""
    stats = gibbs_result.stats[gp_index]
    return {
        f"{prefix}_Sigma_X": gibbs_result.states,
        f"{prefix}_Sigma_Y": gibbs_result.outputs,
        f"{prefix}_weights": gibbs_result.weights,
        f"{prefix}_log_likelihood": gibbs_result.log_likelihood,
        f"{prefix}_T0{suffix}": stats.T0,
        f"{prefix}_T1{suffix}": stats.T1,
        f"{prefix}_T2{suffix}": stats.T2,
        f"{prefix}_T3{suffix}": stats.T3,
    }


def prior_entries(prior, suffix: str = ""):
    return {
        f"prior_T0{suffix}": prior.T0,
        f"prior_T1{suffix}": prior.T1,
        f"prior_T2{suffix}": prior.T2,
        f"prior_T3{suffix}": prior.T3,
    }
