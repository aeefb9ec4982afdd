#!/usr/bin/env python
"""cs-layout (m > 24) APF throughput: single-mass oscillator, m = 41.

The m > 24 kernel family (column-on-sublanes layout, see
``ops/pallas_kernels.py``) historically had only kernel-level or
wall-clock A/B evidence; this bench gives it a tracked per-round
particle-steps/s number alongside the vehicle (m = 20, tiled-layout)
headline. Same measurement protocol as ``bench.py``: full fused sweep,
best of 3, one chip.

Reference workload shape: ``/root/reference/src/SingleMassOscillator.py:
54-81`` (41 Hilbert basis functions on [-7.5, 7.5]^2, 750 steps).

Prints ONE JSON line. Env: BENCH_CS_PARTICLES (default 32768),
BENCH_CS_STEPS (default 750).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bipk_tpu.models import oscillator as smo
    from bipk_tpu.parallel.mesh import particle_mesh
    from bipk_tpu.parallel.sharded import build_sharded_apf

    n_particles = int(os.environ.get("BENCH_CS_PARTICLES", 32768))
    n_steps = int(os.environ.get("BENCH_CS_STEPS", 750))

    cfg = smo.OscillatorConfig(t_end=n_steps * 0.02)
    model = smo.make_model(cfg)
    key = jax.random.key(0)
    key, key_sim = jax.random.split(key)
    _, Y, _, inputs = smo.simulate(key_sim, cfg, dtype=jnp.float32)

    n_dev = len(jax.devices())
    mesh = particle_mesh(n_dev)
    n_particles -= n_particles % n_dev
    run = jax.jit(
        build_sharded_apf(
            model.ssm,
            (model.gp,),
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

    jax.block_until_ready(run(key, *args))
    best = float("inf")
    for _ in range(3):
        key, key_i = jax.random.split(key)
        t0 = time.perf_counter()
        jax.block_until_ready(run(key_i, *args))
        best = min(best, time.perf_counter() - t0)

    steps = Y.shape[0]
    value = n_particles * (steps - 1) / best / n_dev
    print(
        json.dumps(
            {
                "metric": "smo_cs_apf_particle_steps_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "particle-steps/s/chip",
                "m": 41,
                "layout": "cs",
                "wall_s": round(best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
