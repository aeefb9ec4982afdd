"""Microbenchmark for the fused Pallas kernels in isolation.

Times per-call kernel latency INSIDE one ``lax.scan`` dispatch (ITERS
calls per dispatch). Timing separate jitted dispatches is useless here:
the axon remote-TPU harness adds ~28 ms of per-dispatch host overhead to
executables holding prior constants, swamping sub-millisecond kernels
(measured: the same draw/update is 75 us/call inside a scan and 28 ms as
a standalone dispatch, constant in N).

Reports the effective HBM bandwidth of the draw/update kernel (its
roofline resource: packed statistics read once + written once per call).

Usage: KBENCH_N=32768 KBENCH_M=20 [BIPK_PALLAS_LAYOUT=cs] \
    python benchmarks/bench_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.ops import mniw

N = int(os.environ.get("KBENCH_N", 32768))
M = int(os.environ.get("KBENCH_M", 20))
N_OUT = int(os.environ.get("KBENCH_NOUT", 1))
ITERS = int(os.environ.get("KBENCH_ITERS", 200))


def _scan_time(step, carry0, iters=ITERS):
    """Per-iteration wall time of ``step`` inside one scan dispatch."""

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c, None,
                            length=iters)[0]

    out = jax.block_until_ready(run(carry0))
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(carry0))
    return (time.perf_counter() - t0) / iters


def main():
    m, n = M, N_OUT
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    phis = jax.random.normal(k1, (N, 40, m), dtype=jnp.float32) * 0.3
    ys = jax.random.normal(k2, (N, 40, n), dtype=jnp.float32)
    st = jax.jit(jax.vmap(jax.vmap(mniw.suff_stat)))(ys, phis)
    stats = jax.tree_util.tree_map(lambda s: jnp.sum(s, axis=1), st)
    stats_bl = jax.tree_util.tree_map(
        lambda s: jnp.moveaxis(s, 0, -1) if s.ndim == 3 else s, stats
    )
    S = mniw.pack_stats_bl(mniw.MNIW(*stats_bl))
    prior = mniw.natural_from_standard(
        np.zeros((n, m), np.float32),
        np.eye(m, dtype=np.float32) * 2.0,
        np.eye(n, dtype=np.float32) * 1.5,
        5.0,
    )
    phi = jax.random.normal(k3, (m, N), dtype=jnp.float32) * 0.3
    anc = jnp.sort(jax.random.randint(k4, (N,), 0, N, dtype=jnp.int32))
    rows = S.shape[0]
    sbytes = rows * N * 4

    print(f"shapes: N={N} m={m} n={n} rows={rows} "
          f"(packed stats {sbytes/2**20:.1f} MiB), "
          f"layout={os.environ.get('BIPK_PALLAS_LAYOUT', 'tiled')}",
          flush=True)

    # draw/update: the statistics carry evolves through the scan, exactly
    # like the filter sweep (lam < 1 keeps it bounded)
    def du_step(carry):
        key, S = carry
        key, sub = jax.random.split(key)
        S2, y, ld1, ldp = mniw.draw_update_packed_bl(
            sub, S, phi, prior=prior, lam=0.999, m=m, n=n
        )
        return key, S2

    t_du = _scan_time(du_step, (key, S))
    print(f"draw_update:        {t_du*1e6:8.1f} us  "
          f"({2*sbytes/t_du/2**30:7.1f} GiB/s rw)", flush=True)

    def dug_step(carry):
        key, S = carry
        key, sub = jax.random.split(key)
        S2, y, ld1, ldp = mniw.draw_update_gather_packed_bl(
            sub, S, anc, phi, prior=prior, lam=0.999, m=m, n=n
        )
        return key, S2

    t_dug = _scan_time(dug_step, (key, S))
    print(f"draw_update_gather: {t_dug*1e6:8.1f} us  "
          f"({2*sbytes/t_dug/2**30:7.1f} GiB/s rw)", flush=True)

    # factorize/project + log-base-measure: S constant; fold the outputs
    # into a carried accumulator so nothing is dead-code-eliminated
    def fp_step(carry):
        acc, S = carry
        fp = mniw.factorize_project_packed_bl(
            S, phi, prior=prior, lam=0.999, m=m, n=n
        )
        return acc + jnp.sum(fp.logdet_T1) + jnp.sum(fp.mean), S

    t_fp = _scan_time(fp_step, (jnp.float32(0), S))
    print(f"factorize_project:  {t_fp*1e6:8.1f} us  "
          f"({sbytes/t_fp/2**30:7.1f} GiB/s r)", flush=True)

    if os.environ.get("KBENCH_FACTOR"):
        def fpe_step(carry):
            acc, S = carry
            fp, lw = mniw.factorize_project_packed_bl(
                S, phi, prior=prior, lam=0.999, m=m, n=n, emit_factor=True
            )
            return acc + jnp.sum(fp.logdet_T1) + jnp.sum(lw[0]), S

        t_fpe = _scan_time(fpe_step, (jnp.float32(0), S))
        print(f"fp_emit_factor:     {t_fpe*1e6:8.1f} us", flush=True)

        fp0, LW = mniw.factorize_project_packed_bl(
            S, phi, prior=prior, lam=0.999, m=m, n=n, emit_factor=True
        )

        def dugf_step(carry):
            key, S = carry
            key, sub = jax.random.split(key)
            S2, y, ld1, ldp = mniw.draw_update_gather_packed_bl(
                sub, S, anc, phi, prior=prior, lam=0.999, m=m, n=n,
                factor=LW,
            )
            return key, S2

        t_dugf = _scan_time(dugf_step, (key, S))
        print(f"draw_gather_factor: {t_dugf*1e6:8.1f} us", flush=True)

    def lbm_step(carry):
        acc, S = carry
        lbm = mniw.log_base_measure_packed_bl(S, prior, m, n)
        return acc + jnp.sum(lbm), S

    t_lbm = _scan_time(lbm_step, (jnp.float32(0), S))
    print(f"log_base_measure:   {t_lbm*1e6:8.1f} us  "
          f"({sbytes/t_lbm/2**30:7.1f} GiB/s r)", flush=True)


if __name__ == "__main__":
    main()
