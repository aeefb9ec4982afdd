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

Resilience: the measurement runs in a child process (``BIPK_BENCH_WORKER=1``)
with a timeout and up to ``BIPK_BENCH_ATTEMPTS`` (default 3) retries — the
remote-TPU tunnel in this environment intermittently hangs or refuses
backend init (irreversibly poisoning the process that touched it), and a
transient outage must not cost the benchmark run. Only the worker's final
JSON line is forwarded to stdout.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

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


def orchestrate() -> int:
    attempts = int(os.environ.get("BIPK_BENCH_ATTEMPTS", "3"))
    timeout = float(os.environ.get("BIPK_BENCH_TIMEOUT", "1500"))
    env = dict(os.environ, BIPK_BENCH_WORKER="1")
    for i in range(attempts):
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(
                f"bench attempt {i + 1}/{attempts} timed out after "
                f"{timeout:.0f}s (hung TPU tunnel?)",
                file=sys.stderr,
                flush=True,
            )
            continue
        line = next(
            (
                ln
                for ln in reversed(res.stdout.strip().splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if res.returncode == 0 and line:
            print(line)
            return 0
        print(
            f"bench attempt {i + 1}/{attempts} rc={res.returncode}\n"
            f"{res.stderr[-2000:]}",
            file=sys.stderr,
            flush=True,
        )
        if i + 1 < attempts:
            time.sleep(float(os.environ.get("BIPK_BENCH_RETRY_SLEEP", "60")))
    return 1


if __name__ == "__main__":
    if os.environ.get("BIPK_BENCH_WORKER") == "1":
        main()
    else:
        sys.exit(orchestrate())
