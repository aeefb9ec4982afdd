"""Quantify the GSPMD (``mesh=``) vs shard_map (``--mesh N``) perf cliff.

The GSPMD path (``build_apf(..., mesh=...)``) is exact — XLA's SPMD
partitioner inserts the collectives automatically — but ``pallas_call``
cannot be partitioned, so on a multi-device mesh every fused kernel
(factorize+project, draw+update with the fused resampling gather) diverts
to the XLA fallback implementations (``apf.py:75-80``). The shard_map
production path (``bipk_tpu.parallel``) runs the Pallas kernels per shard.

This benchmark measures that per-chip kernel cliff directly on one TPU
chip: the same vehicle APF sweep with the fused Pallas kernels (what the
shard_map path executes per shard) vs with ``BIPK_DISABLE_PALLAS=1``
(the XLA fallback kernels that the multi-device GSPMD path executes).
Each configuration runs in a child process (the BIPK_DISABLE_PALLAS
toggle is read at trace time, and a fresh process also avoids any cached
jit state leaking between configurations).

Measured (v5e-1, N=32768, T=1500, f32): fused 24.53M particle-steps/s/chip
vs XLA-fallback 0.90M — a **27x cliff**. This single-chip Pallas-vs-XLA
proxy omits GSPMD's collective/communication overhead, so it is a LOWER
BOUND on the real multi-device cliff. Conclusion recorded in
``docs/DESIGN.md`` and ``build_apf``'s docstring: ``mesh=`` is an
exactness/validation path; production multi-chip runs use shard_map
(``bipk_tpu.parallel``), which the scripts' ``--mesh N`` already selects.

Usage: python benchmarks/bench_gspmd_cliff.py  (writes one JSON line)
Env: CLIFF_PARTICLES (default 32768), CLIFF_STEPS (default 1500).
"""

import json
import os
import subprocess
import sys

_CHILD = """
import json, os, sys, time
sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
from bipk_tpu.algorithms import build_apf
from bipk_tpu.models import vehicle as veh

n_particles = %(n)d
n_steps = %(t)d
cfg = veh.VehicleConfig(t_end=n_steps * 0.02)
model = veh.make_model(cfg)
key = jax.random.key(cfg.seed)
key, key_sim = jax.random.split(key)
_, Y, _, _, inputs = veh.simulate(key_sim, cfg, dtype=jnp.float32)
# float arange can make len(Y) = n_steps + 1; use the simulated length and
# the repo-wide N*(T-1)/rt convention (ablate_step.py, bench.py) so the
# cliff numbers are directly comparable to the headline
n_steps = Y.shape[0] - 1
x0 = jnp.asarray(model.x0, jnp.float32)
p0 = jnp.asarray(model.p0, jnp.float32)
apf = jax.jit(build_apf(model.ssm, model.gps, n_particles, 1.0,
                        dtype=jnp.float32))
key, key_run = jax.random.split(key)
jax.block_until_ready(apf(key_run, Y, inputs, x0, p0))  # compile
best = float("inf")
for _ in range(3):
    key, key_i = jax.random.split(key)
    t0 = time.perf_counter()
    jax.block_until_ready(apf(key_i, Y, inputs, x0, p0))
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"psps": n_particles * n_steps / best, "secs": best}))
"""


def _run(extra_env, n, t):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, **extra_env)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"root": root, "n": n, "t": t}],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n = int(os.environ.get("CLIFF_PARTICLES", 32768))
    t = int(os.environ.get("CLIFF_STEPS", 1500))
    fused = _run({}, n, t)
    fallback = _run({"BIPK_DISABLE_PALLAS": "1"}, n, t)
    cliff = fused["psps"] / fallback["psps"]
    print(json.dumps({
        "metric": "gspmd_fallback_cliff",
        "fused_psps": round(fused["psps"], 1),
        "xla_fallback_psps": round(fallback["psps"], 1),
        "value": round(cliff, 2),
        "unit": "x (fused Pallas / XLA-fallback throughput)",
        "n_particles": n, "n_steps": t,
    }))


if __name__ == "__main__":
    main()
