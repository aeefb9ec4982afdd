"""The reference ``*_Figures.py`` scripts run UNCHANGED on our ``.mat`` files.

This is the strong form of the output-contract claim: not key-set equality
(``test_matio.py``) but actual execution of the untouched reference figure
scripts (``/root/reference/{SingleMassOscillator,VehicleSimulation,EMPS}_
Figures.py``) against ``.mat`` files produced by this framework's entry
scripts, asserting every expected PDF is rendered.

The SMO/vehicle/EMPS tests always run (tiny configs, a few minutes each on
a CPU-only host). The composite ``Publication_Figures.py`` case needs
full-scale artifacts in ``plots/`` and skips with a clear reason when they
are absent. ``BIPK_REF_FIGURE_TESTS=0`` skips the long ones on severely
time-boxed hosts.
"""

import os
import subprocess
import sys

import pytest

# multi-minute on the 1-vCPU CI host (mesh compiles, GSPMD,
# subprocess fixtures); excluded from the core tier
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
DRIVER = os.path.join(REPO, "tests", "_ref_fig_driver.py")

run_gated = pytest.mark.skipif(
    os.environ.get("BIPK_REF_FIGURE_TESTS", "1") == "0",
    reason="BIPK_REF_FIGURE_TESTS=0: multi-minute reference-figure run",
)


def _clean_env():
    env = dict(os.environ)
    # the generator subprocess must not inherit pytest's virtual-device
    # flags; figure scripts run on default CPU with the reference's x64
    env.pop("JAX_PLATFORMS", None)
    env["MPLBACKEND"] = "Agg"
    return env


def _generate(tmp_path, script, extra):
    out = tmp_path / "plots"
    out.mkdir(exist_ok=True)
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", script),
        "--cpu",
        *extra,
    ]
    res = subprocess.run(
        cmd, cwd=tmp_path, env=_clean_env(), capture_output=True, text=True,
        timeout=1500,
    )
    assert res.returncode == 0, res.stderr[-3000:]


def _run_figures(tmp_path, fig_script, expected_pdfs):
    res = subprocess.run(
        [sys.executable, DRIVER, os.path.join(REF, fig_script)],
        cwd=tmp_path,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    for pdf in expected_pdfs:
        path = tmp_path / "plots" / pdf
        assert path.exists() and path.stat().st_size > 0, pdf


def test_smo_reference_figures_run_unchanged(tmp_path):
    _generate(
        tmp_path,
        "single_mass_oscillator.py",
        ["--particles", "30", "--gibbs-iters", "6", "--t-end", "0.5",
         "--plot-grid", "12", "--out", "plots/SingleMassOscillator.mat"],
    )
    _run_figures(
        tmp_path,
        "SingleMassOscillator_Figures.py",
        [
            "SingleMassOscillator_PGAS_X.pdf",
            "SingleMassOscillator_PGAS_Fsd_fcn_0.pdf",
            "SingleMassOscillator_PGAS_Fsd_fcn_1.pdf",
            "SingleMassOscillator_PGAS_Fsd_wRMSE.pdf",
            "SingleMassOscillator_APF_X.pdf",
            "SingleMassOscillator_APF_Fsd_fcn_0.pdf",
            "SingleMassOscillator_APF_Fsd_fcn_1.pdf",
            "SingleMassOscillator_APF_Fsd_wRMSE.pdf",
        ],
    )


@run_gated
def test_vehicle_reference_figures_run_unchanged(tmp_path):
    _generate(
        tmp_path,
        "vehicle.py",
        ["--particles", "30", "--gibbs-iters", "6", "--t-end", "0.5",
         "--out", "plots/Vehicle.mat"],
    )
    _run_figures(
        tmp_path,
        "VehicleSimulation_Figures.py",
        [
            "Vehicle_PGAS_X.pdf",
            "Vehicle_PGAS_muf_fcn_0.pdf",
            "Vehicle_PGAS_muf_wRMSE.pdf",
            "Vehicle_APF_X.pdf",
            "Vehicle_APF_muf_fcn_0.pdf",
            "Vehicle_APF_muf_wRMSE.pdf",
        ],
    )


@run_gated
def test_publication_figures_run_unchanged():
    """The reference's composite ``Publication_Figures.py`` (1204 lines,
    ``/root/reference/Publication_Figures.py``) runs unchanged against
    FULL-SIZE ``.mat`` results from all three examples.

    Unlike the per-example figure scripts, the composite hard-indexes
    Gibbs iteration 799 (``PGAS_slice_idx = [49, 799]``,
    ``Publication_Figures.py:20``) and time step 499, so it only works on
    reference-configuration runs (800 sweeps; >=500 steps). It therefore
    runs in the repo's ``plots/`` directory against artifacts produced by
    the full-scale entry-script runs and skips with a clear reason when
    they are absent or undersized. The EMPS section additionally needs the
    classic-PGAS baseline traces (``offline_Sigma_X_PGAS``), i.e. an
    ``emps.py`` run without ``--skip-baseline``.
    """
    import scipy.io

    need = {
        "SingleMassOscillator.mat": ("offline_Sigma_X", 800, 500),
        "Vehicle.mat": ("offline_Sigma_X", 800, 500),
        "EMPS.mat": ("offline_Sigma_X_PGAS", 800, 500),
    }
    for fname, (key, min_iters, min_steps) in need.items():
        path = os.path.join(REPO, "plots", fname)
        if not os.path.exists(path):
            pytest.skip(f"full-size plots/{fname} not present")
        shape = scipy.io.loadmat(path)[key].shape
        if shape[0] < min_steps or shape[1] < min_iters:
            pytest.skip(
                f"plots/{fname} {key} shape {shape} below full scale "
                f"({min_steps} steps x {min_iters} iters)"
            )

    for pdf in ("results_traj_offline.pdf", "results_fcn_offline.pdf",
                "results_traj_online.pdf", "results_fcn_online.pdf"):
        stale = os.path.join(REPO, "plots", pdf)
        if os.path.exists(stale):
            os.remove(stale)

    res = subprocess.run(
        [sys.executable, DRIVER, os.path.join(REF, "Publication_Figures.py")],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    for pdf in ("results_traj_offline.pdf", "results_fcn_offline.pdf",
                "results_traj_online.pdf", "results_fcn_online.pdf"):
        path = os.path.join(REPO, "plots", pdf)
        assert os.path.exists(path) and os.path.getsize(path) > 0, pdf


@run_gated
def test_emps_reference_figures_run_unchanged(tmp_path):
    _generate(
        tmp_path,
        "emps.py",
        ["--particles", "30", "--gibbs-iters", "6", "--max-steps", "40",
         "--skip-baseline", "--out", "plots/EMPS.mat"],
    )
    _run_figures(
        tmp_path,
        "EMPS_Figures.py",
        [
            "EMPS_PGAS_X.pdf",
            "EMPS_PGAS_F_fcn_0.pdf",
            "EMPS_PGAS_RMSE.pdf",
            "EMPS_APF_X.pdf",
            "EMPS_APF_F_fcn_0.pdf",
            "EMPS_APF_F_wRMSE.pdf",
        ],
    )
