"""Secondary benchmark: seconds per marginalized-PGAS Gibbs iteration.

BASELINE.md's second headline: >= 50x the CPU reference per Gibbs sweep at
10k particles. One Gibbs iteration = one conditional-SMC sweep (Algorithm 3)
+ the reference-statistics recomputation, on the vehicle workload.

Usage: python benchmarks/bench_gibbs.py  (writes one JSON line)
Env: GIBBS_PARTICLES (default 10240), GIBBS_STEPS (default 1500).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n_particles = int(os.environ.get("GIBBS_PARTICLES", 10240))
    n_steps = int(os.environ.get("GIBBS_STEPS", 1500))

    from bipk_tpu.algorithms import build_apf, build_csmc
    from bipk_tpu.algorithms.gibbs import summed_reference_stats
    from bipk_tpu.models import vehicle as veh
    from bipk_tpu.utils.matio import sample_reference_trajectory

    cfg = veh.VehicleConfig(t_end=n_steps * 0.02)
    model = veh.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(key_sim, cfg, dtype=jnp.float32)
    x0 = jnp.asarray(model.x0, jnp.float32)
    p0 = jnp.asarray(model.p0, jnp.float32)

    # build an initial reference trajectory with a small APF run
    apf = jax.jit(build_apf(model.ssm, model.gps, 256, 1.0, dtype=jnp.float32))
    key, key_apf, key_traj = jax.random.split(key, 3)
    res = apf(key_apf, Y, inputs, x0, p0)
    ref_state, ref_iv = sample_reference_trajectory(key_traj, res)
    ref_stats = summed_reference_stats(
        model.gps, ref_state, ref_iv, inputs, jnp.float32
    )

    csmc = jax.jit(
        build_csmc(model.ssm, model.gps, n_particles, dtype=jnp.float32)
    )
    args = (Y, inputs, x0, p0, ref_state, ref_iv, ref_stats)
    key, key_w = jax.random.split(key)
    jax.block_until_ready(csmc(key_w, *args))  # compile

    best = float("inf")
    for _ in range(3):
        key, key_i = jax.random.split(key)
        t0 = time.perf_counter()
        jax.block_until_ready(csmc(key_i, *args))
        best = min(best, time.perf_counter() - t0)

    baseline_s = None
    base_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    if os.path.exists(base_path):
        with open(base_path) as fh:
            psps = json.load(fh)["cpu_reference_particle_steps_per_sec"]
        # reference-architecture sweep time at this workload size
        baseline_s = n_particles * (n_steps - 1) / psps

    print(
        json.dumps(
            {
                "metric": "vehicle_gibbs_seconds_per_iteration",
                "value": round(best, 3),
                "unit": f"s/sweep @ {n_particles} particles x {n_steps} steps",
                "vs_baseline": round(baseline_s / best, 2) if baseline_s else None,
            }
        )
    )


if __name__ == "__main__":
    main()
