#!/usr/bin/env python
"""Headline benchmark: vehicle-APF particle-filter throughput on one chip.

Runs the flagship workload — the vehicle online APF (two learned
tire-friction GPs, 20 basis functions each, RK4 single-track skeleton,
1500 time steps) — as one fused scan and reports

    particle-steps/sec/chip

against the measured reference-style CPU baseline (the reference
architecture: float64, one jitted dispatch per time step from a host loop —
see ``benchmarks/measure_cpu_baseline.py`` and ``BASELINE_MEASURED.json``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env overrides: BENCH_PARTICLES (default 32768), BENCH_STEPS (default 1500).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    n_particles = int(os.environ.get("BENCH_PARTICLES", 32768))
    n_steps = int(os.environ.get("BENCH_STEPS", 1500))

    from bipk_tpu.models import vehicle as veh
    from bipk_tpu.parallel.mesh import particle_mesh
    from bipk_tpu.parallel.sharded import build_sharded_apf

    cfg = veh.VehicleConfig(t_end=n_steps * 0.02)
    model = veh.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(key_sim, cfg, dtype=jnp.float32)

    n_dev = len(jax.devices())
    mesh = particle_mesh(n_dev)
    n_particles -= n_particles % n_dev
    run = jax.jit(
        build_sharded_apf(
            model.ssm,
            model.gps,
            n_particles,
            mesh,
            forgetting_factor=cfg.forgetting_factor,
            dtype=jnp.float32,
        )
    )
    args = (
        Y,
        inputs,
        jnp.asarray(model.x0, dtype=jnp.float32),
        jnp.asarray(model.p0, dtype=jnp.float32),
    )

    # warmup/compile
    jax.block_until_ready(run(key, *args))

    best = float("inf")
    for i in range(3):
        key, key_i = jax.random.split(key)
        t0 = time.perf_counter()
        jax.block_until_ready(run(key_i, *args))
        best = min(best, time.perf_counter() - t0)

    particle_steps = n_particles * (n_steps - 1)
    value = particle_steps / best / n_dev

    baseline = None
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(base_path):
        with open(base_path) as fh:
            baseline = json.load(fh).get("cpu_reference_particle_steps_per_sec")

    result = {
        "metric": "vehicle_apf_particle_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
