"""Subprocess driver: execute a reference ``*_Figures.py`` script unchanged.

Usage: ``python _ref_fig_driver.py <path-to-reference-figure-script>``
with cwd set to a directory containing ``plots/<Example>.mat``.

The only environmental adaptations (no edits to the reference script):
- headless Agg backend and a no-op ``plt.show``
- ``text.usetex`` off (no LaTeX binary in this image; the reference's
  ``src/Publication_Plotting.py:10`` turns it on at import)
- for ``EMPS_Figures.py`` only: ``src.EMPS`` is stubbed with ``steps``
  read from the ``.mat`` being plotted. The real module is unimportable
  in any environment without the external ``DATA_EMPS.mat`` download
  (``/root/reference/src/EMPS.py:49`` loads it at import time) and needs
  ``equinox``; the figure script uses nothing from it but the integer
  ``steps`` (``/root/reference/EMPS_Figures.py:7,197-202``).
"""

import runpy
import sys
import types

# Force the CPU backend before anything initializes JAX: the reference
# scripts were written for CPU x64, and on this host the default platform
# may be a remote-TPU plugin whose tunnel can be slow or down — the figure
# math is tiny and must not depend on accelerator availability. (The env
# var JAX_PLATFORMS is ignored by the plugin; only the in-process config
# update before backend init is honored — see tests/conftest.py.)
import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, "/root/reference")
import src.Publication_Plotting  # noqa: F401,E402  (sets usetex rcParams)

plt.rcParams["text.usetex"] = False
plt.show = lambda *a, **kw: None

if sys.argv[1].endswith("EMPS_Figures.py"):
    import scipy.io

    stub = types.ModuleType("src.EMPS")
    stub.steps = int(
        scipy.io.loadmat("plots/EMPS.mat")["online_T0"].shape[0]
    )
    sys.modules["src.EMPS"] = stub

runpy.run_path(sys.argv[1], run_name="__main__")
