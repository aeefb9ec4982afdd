"""Full-length 1M-particle vehicle sweep, end to end.

Runs the ENTIRE reference-length online sweep (1500 steps at dt = 0.02,
``/root/reference/src/Vehicle.py`` configuration) at 2^20 particles on
the available chips via the windowed sharded APF: the scan is segmented
into ~100-step dispatches with the sharded particle carry staying on
device, so no single dispatch exceeds the remote-runner RPC deadline —
this replaces the earlier 100-step extrapolated measurement with a real
end-to-end number.

Usage: [BENCH1M_N=1048576] [BENCH1M_WINDOW=100] python benchmarks/bench_1m.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bipk_tpu.models import vehicle as veh
from bipk_tpu.parallel.mesh import particle_mesh
from bipk_tpu.parallel.sharded import build_sharded_apf

N = int(os.environ.get("BENCH1M_N", 1 << 20))
WINDOW = int(os.environ.get("BENCH1M_WINDOW", 100))


def main():
    n_dev = len(jax.devices())
    mesh = particle_mesh(n_dev)
    cfg = veh.VehicleConfig()  # reference length: 30 s / dt 0.02 = 1500
    model = veh.make_model(cfg)
    key = jax.random.key(0)
    key, key_sim = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(key_sim, cfg, dtype=jnp.float32)
    T = Y.shape[0]

    run = build_sharded_apf(
        model.ssm, model.gps, N, mesh, cfg.forgetting_factor,
        dtype=jnp.float32, window=WINDOW,
    )
    x0 = jnp.asarray(model.x0, jnp.float32)
    p0 = jnp.asarray(model.p0, jnp.float32)

    # one warmup window-compile pass on a short prefix (two window sizes:
    # WINDOW and the ragged tail)
    _ = run(key, Y[: WINDOW + (T - 1) % WINDOW + 1], inputs[: WINDOW + (T - 1) % WINDOW + 1], x0, p0)

    t0 = time.perf_counter()
    res = run(key, Y, inputs, x0, p0)
    jax.block_until_ready(res.final_log_weights)
    wall = time.perf_counter() - t0
    psps = N * (T - 1) / wall
    print(json.dumps({
        "metric": "vehicle_apf_1m_full_sweep_psps",
        "value": round(psps / 1e6, 3),
        "unit": "M particle-steps/s",
        "particles": N,
        "steps": T,
        "window": WINDOW,
        "devices": n_dev,
        "wall_s": round(wall, 2),
        "ess_mean": float(jnp.asarray(res.ess).mean()),
    }))


if __name__ == "__main__":
    main()
