"""Test configuration: 8 virtual CPU devices (TPU-mesh simulation) + x64.

Sharding tests exercise the multi-chip code paths on a simulated mesh via
``--xla_force_host_platform_device_count`` — the standard way to validate a
TPU mesh program without a real slice. Numerics tests validate the f32 TPU
defaults against f64 ground truth, so x64 is enabled for the test process.

Note: the axon TPU harness ignores the ``JAX_PLATFORMS`` environment
variable, so the platform is forced through ``jax.config`` instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
