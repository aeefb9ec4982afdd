"""Chain-parallel Gibbs throughput: sweeps/second vs number of chains.

The reference's workloads run ONE PGAS chain with 200 particles — a sliver
of a TPU chip. This benchmark measures how many *independent chains* one
chip sustains at the reference configuration before per-chain throughput
degrades: `build_gibbs(..., n_chains=C)` vmaps the fused sweep over C, so
until the chip saturates, C chains cost roughly one chain's wall time —
i.e. convergence diagnostics and embarrassingly-parallel posterior
replication are nearly free.

Prints one line per C: chain-sweeps/second (C x sweeps / wall).

Usage:
    python benchmarks/bench_chains.py            # vehicle, 200 particles
    BENCH_CHAIN_SWEEPS=20 BENCH_PARTICLES=200 python benchmarks/bench_chains.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bipk_tpu.algorithms import build_apf, build_gibbs
from bipk_tpu.models import vehicle as veh
from bipk_tpu.utils import matio

N_PARTICLES = int(os.environ.get("BENCH_PARTICLES", 200))
N_SWEEPS = int(os.environ.get("BENCH_CHAIN_SWEEPS", 20))
T_END = float(os.environ.get("BENCH_T_END", 30.0))
CHAIN_COUNTS = tuple(
    int(c)
    for c in os.environ.get("BENCH_CHAINS", "1,2,4,8,16,32,64").split(",")
)


def main():
    dtype = jnp.float32
    cfg = veh.VehicleConfig(n_particles=N_PARTICLES, t_end=T_END)
    model = veh.make_model(cfg)
    key = jax.random.key(cfg.seed)
    key, key_sim = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(key_sim, cfg, dtype=dtype)

    apf = jax.jit(
        build_apf(
            model.ssm, model.gps, N_PARTICLES,
            cfg.forgetting_factor, dtype=dtype,
        )
    )
    key, key_ref, key_traj = jax.random.split(key, 3)
    ref_run = jax.block_until_ready(apf(key_ref, Y, inputs, model.x0, model.p0))

    base = None
    for c in CHAIN_COUNTS:
        if c == 1:
            ref_state, ref_iv = matio.sample_reference_trajectory(
                key_traj, ref_run
            )
        else:
            refs = [
                matio.sample_reference_trajectory(k, ref_run)
                for k in jax.random.split(key_traj, c)
            ]
            ref_state = jnp.stack([r[0] for r in refs])
            ref_iv = tuple(
                jnp.stack([r[1][i] for r in refs])
                for i in range(len(model.gps))
            )
        gibbs = jax.jit(
            build_gibbs(
                model.ssm, model.gps, N_PARTICLES, N_SWEEPS,
                dtype=dtype, n_chains=c if c > 1 else None,
            )
        )
        args = (Y, inputs, model.x0, model.p0, ref_state, ref_iv)
        jax.block_until_ready(gibbs(key, *args))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(gibbs(key, *args))
        dt = time.perf_counter() - t0
        rate = c * N_SWEEPS / dt
        if base is None:
            base = rate
        print(
            f"chains={c:3d}: {dt:7.2f} s for {c * N_SWEEPS} chain-sweeps "
            f"-> {rate:8.2f} sweeps/s ({rate / base:5.2f}x single-chain)",
            flush=True,
        )


if __name__ == "__main__":
    main()
