"""Multi-chip scaling evidence on the virtual CPU mesh (SURVEY A7/P1-P4).

Real multi-chip hardware is unavailable in this environment, so this
records CORRECTNESS-GRADE scaling structure for the shard_map APF and
cSMC: per-mesh-size wall time for a fixed GLOBAL population (weak wall
numbers — CPU timings do not transfer to TPU) and, more importantly, the
COLLECTIVE-OP structure of the compiled programs: the number of
collective ops must stay CONSTANT as the mesh grows (per-step collective
count independent of n_devices means the algorithm's communication
schedule is O(1) rounds per step, riding ICI all-reduce/permute whose
cost scales gently with ring size).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/bench_scaling.py
Writes one JSON line per (algorithm, mesh size).
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__" and jax.default_backend() != "cpu":  # pragma: no cover
    raise SystemExit(
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu"
    )

import jax.numpy as jnp

from bipk_tpu.algorithms import build_apf
from bipk_tpu.algorithms.gibbs import summed_reference_stats
from bipk_tpu.models import toy
from bipk_tpu.parallel.mesh import particle_mesh
from bipk_tpu.parallel.sharded import build_sharded_apf
from bipk_tpu.parallel.sharded_csmc import build_sharded_csmc
from bipk_tpu.utils.matio import sample_reference_trajectory

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)\b"
)


def collective_counts(compiled) -> dict:
    """Histogram of collective ops in a compiled executable's HLO."""
    hlo = compiled.as_text()
    counts: dict = {}
    for m in COLLECTIVE_RE.finditer(hlo):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def setup(n_particles, n_steps):
    cfg = toy.ToyConfig(n_particles=n_particles, n_steps=n_steps)
    model = toy.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    _, Y = toy.simulate(key_sim, cfg, dtype=jnp.float32)
    inputs = jnp.zeros((cfg.n_steps, 0))
    return cfg, model, Y, inputs, key


def bench_apf(n_dev, n_particles=1024, n_steps=16, scheme="exact"):
    cfg, model, Y, inputs, key = setup(n_particles, n_steps)
    mesh = particle_mesh(n_dev)
    run = jax.jit(
        build_sharded_apf(
            model.ssm, (model.gp,), n_particles, mesh, 1.0,
            dtype=jnp.float32, resampling_scheme=scheme,
        )
    )
    lowered = run.lower(key, Y, inputs, model.x0, model.p0)
    compiled = lowered.compile()
    out = jax.block_until_ready(run(key, Y, inputs, model.x0, model.p0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(key, Y, inputs, model.x0, model.p0))
    best = time.perf_counter() - t0
    return {
        "algo": f"apf-{scheme}",
        "n_devices": n_dev,
        "n_particles": n_particles,
        "steps": n_steps,
        "wall_s": round(best, 4),
        "collectives": collective_counts(compiled),
    }


def bench_csmc(n_dev, n_particles=512, n_steps=16):
    cfg, model, Y, inputs, key = setup(n_particles, n_steps)
    mesh = particle_mesh(n_dev)
    apf = jax.jit(
        build_apf(model.ssm, (model.gp,), 256, 1.0, dtype=jnp.float32)
    )
    key, key_a, key_t = jax.random.split(key, 3)
    res = apf(key_a, Y, inputs, model.x0, model.p0)
    ref_state, ref_iv = sample_reference_trajectory(key_t, res)
    ref_stats = summed_reference_stats(
        (model.gp,), ref_state, ref_iv, inputs, jnp.float32
    )
    run = jax.jit(
        build_sharded_csmc(
            model.ssm, (model.gp,), n_particles, mesh, dtype=jnp.float32
        )
    )
    args = (key, Y, inputs, model.x0, model.p0, ref_state, ref_iv,
            ref_stats)
    compiled = run.lower(*args).compile()
    out = jax.block_until_ready(run(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(*args))
    best = time.perf_counter() - t0
    return {
        "algo": "csmc",
        "n_devices": n_dev,
        "n_particles": n_particles,
        "steps": n_steps,
        "wall_s": round(best, 4),
        "collectives": collective_counts(compiled),
    }


def main():
    n_max = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_max]
    for n_dev in sizes:
        print(json.dumps(bench_apf(n_dev)), flush=True)
    for n_dev in sizes:
        print(json.dumps(bench_csmc(n_dev)), flush=True)


if __name__ == "__main__":
    main()
