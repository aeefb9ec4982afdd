"""End-to-end .mat contract + figure-rendering smoke test.

Runs a miniature single-mass-oscillator experiment through the real entry
script, verifies the written .mat has exactly the key set the reference's
figure script consumes (``/root/reference/SingleMassOscillator_Simulation.py:
94-124``), and renders the figure from it.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

# multi-minute on the 1-vCPU CI host (mesh compiles, GSPMD,
# subprocess fixtures); excluded from the core tier
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REFERENCE_SMO_KEYS = {
    "offline_Sigma_X", "offline_Sigma_Y", "offline_Sigma_F",
    "offline_weights", "offline_log_likelihood",
    "offline_T0", "offline_T1", "offline_T2", "offline_T3",
    "online_Sigma_X", "online_Sigma_Y", "online_Sigma_F",
    "online_weights", "online_log_likelihood",
    "online_T0", "online_T1", "online_T2", "online_T3",
    "time", "X_plot", "basis_plot", "F_sd_true_plot",
    "prior_T0", "prior_T1", "prior_T2", "prior_T3",
    "X", "Y", "F_sd",
}


@pytest.fixture(scope="module")
def smo_mat(tmp_path_factory):
    out = tmp_path_factory.mktemp("plots") / "SingleMassOscillator.mat"
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "single_mass_oscillator.py"),
            "--quick",
            "--cpu",
            "--out", str(out),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    return str(out)


def test_mat_keys_match_reference_contract(smo_mat):
    import scipy.io

    data = scipy.io.loadmat(smo_mat)
    keys = {k for k in data.keys() if not k.startswith("__")}
    missing = REFERENCE_SMO_KEYS - keys
    assert not missing, f"missing keys: {missing}"


def test_mat_shapes_consistent(smo_mat):
    import scipy.io

    data = scipy.io.loadmat(smo_mat)
    T, N = data["online_Sigma_X"].shape[:2]
    assert data["online_weights"].shape == (T, N)
    np.testing.assert_allclose(data["online_weights"].sum(axis=1), 1.0, rtol=1e-5)
    K = data["offline_Sigma_X"].shape[1]
    assert data["offline_T0"].shape[0] == K
    assert data["basis_plot"].shape[1] == data["prior_T1"].shape[0]
    assert np.isfinite(data["offline_log_likelihood"]).all()


def test_figure_renders(smo_mat, tmp_path):
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "figures.py"),
            "--cpu",
            smo_mat,
            "--outdir", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert os.path.exists(tmp_path / "SingleMassOscillator_fig.pdf")
