"""Attribution microbench for the draw/update kernel's compute bound.

Times stripped-down variants of the fused draw/update kernel (same DMA
footprint: read one packed-statistics block, write one) to attribute its
~380 us/call (m=20, N=32768, v5e) between DMA, the serial Cholesky
chain, the triangular substitutions, and the rank-1 update. The
``chol_par`` variant runs the SAME number of multiply-subtract ops as the
real Cholesky but with NO serial dependency chain — the gap between
``chol`` and ``chol_par`` is pure dependency/latency stall, the gap
between ``chol_par`` and ``copy`` is op-count throughput.

Usage: KBENCH_N=32768 KBENCH_M=20 python benchmarks/bench_kparts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bipk_tpu.ops import pallas_kernels as pk

N = int(os.environ.get("KBENCH_N", 32768))
M = int(os.environ.get("KBENCH_M", 20))
# the axon remote harness adds ~30 ms (noisy, +-5 ms) of per-dispatch
# overhead; sub-100-us kernels need thousands of in-dispatch iterations
# to rise above it, and the iters=A vs iters=B marginal cancels it
ITERS = int(os.environ.get("KBENCH_ITERS", 2000))


def _rows(m, n=1):
    return m * n + m * (m + 1) // 2 + n * (n + 1) // 2 + 1


def _kernel(s_ref, o_ref, l_ref, *, m, n, mode):
    raw_t0, raw_t1, raw_t2, raw_t3 = pk._packed_readers(s_ref, m, n)
    read_a = pk._make_read_a(raw_t1, None, 1e-6, 0.999, m)
    rows = _rows(m, n)
    extra = jnp.zeros_like(s_ref[0])
    if mode == "copy":
        pass
    elif mode == "chol":
        diag = pk._chol_scratch(read_a, m, l_ref)
        for d in diag:
            extra = extra + d
    elif mode == "chol_par":
        # same multiply-subtract count as _chol_scratch (m^3/6 + panel
        # traffic) but every op independent: accumulate products of
        # rotated input rows — no dependency chain, no rsqrt.
        cnt = 0
        acc = [jnp.zeros_like(s_ref[0]) for _ in range(8)]
        total = m * (m + 1) * (m + 2) // 6  # madds in the real chol
        r = 0
        while cnt < total:
            a = s_ref[r % rows]
            b = s_ref[(r * 7 + 3) % rows]
            acc[cnt % 8] = acc[cnt % 8] + a * b
            cnt += 1
            r += 1
        for a in acc:
            extra = extra + a
    elif mode == "chol_subst":
        diag = pk._chol_scratch(read_a, m, l_ref)

        def read_l(i, k):
            return l_ref[i * (i + 1) // 2 + k]

        phi = [s_ref[i] for i in range(m)]
        white = []
        v = []
        for i in range(m):
            li = [read_l(i, k) for k in range(i)]
            row = []
            for c in range(n):
                acc = raw_t0(i, c)
                for k in range(i):
                    acc = acc - li[k] * white[k][c]
                row.append(acc / diag[i])
            white.append(row)
            accv = phi[i]
            for k in range(i):
                accv = accv - li[k] * v[k]
            v.append(accv / diag[i])
        for i in range(m):
            extra = extra + v[i] + white[i][0]
    elif mode in ("fpcore", "fpcore_prior", "draw"):
        phi = [s_ref[i] for i in range(m)]

        class _PhiRef:
            def __getitem__(self, i):
                return phi[i]

        if mode == "fpcore_prior":
            p0 = jnp.zeros((m, n), jnp.float32)
            p1 = jnp.eye(m, dtype=jnp.float32) * 2.0
            p2 = jnp.eye(n, dtype=jnp.float32) * 1.5
        else:
            p0 = p1 = p2 = None
        psi, white, mean, col, hld, ldp = pk._factorize_project_core(
            raw_t0, raw_t1, raw_t2, _PhiRef(), p0, p1, p2,
            m=m, n=n, jitter=1e-6, lam=0.999, l_ref=l_ref,
        )
        extra = extra + mean[0] + col + hld + ldp
        for a in range(n):
            for b in range(n):
                extra = extra + psi[a][b]
        if mode == "draw":
            df_pred = raw_t3() * 0.999 + 5.0 + (1.0 - n)
            two_pi = 6.283185307179586
            for c in range(n):
                u = 1.0 - jnp.abs(s_ref[m + c]) * 1e-6
                r = jnp.sqrt(
                    df_pred
                    * (jnp.exp(-(2.0 / df_pred) * jnp.log(u)) - 1.0)
                )
                t = r * jnp.cos(two_pi * s_ref[m + n + c])
                extra = extra + jnp.sqrt(psi[c][c] / df_pred) * t
            extra = extra + mean[0] * jnp.sqrt(col)
    elif mode == "update":
        phi = [s_ref[i] for i in range(m)]
        y = [s_ref[m + c] for c in range(n)]
        o1 = m * n
        o2 = o1 + m * (m + 1) // 2
        o3 = o2 + n * (n + 1) // 2
        lam = 0.999
        for i in range(m):
            for c in range(n):
                o_ref[i * n + c] = raw_t0(i, c) * lam + phi[i] * y[c]
        for j in range(m):
            for i in range(j, m):
                o_ref[o1 + j * m - (j * (j - 1)) // 2 + i - j] = (
                    raw_t1(i, j) * lam + phi[i] * phi[j]
                )
        for b in range(n):
            for a in range(b, n):
                o_ref[o2 + b * n - (b * (b - 1)) // 2 + a - b] = (
                    raw_t2(a, b) * lam + y[a] * y[b]
                )
        o_ref[o3] = raw_t3() * lam + 1.0
        return
    else:
        raise ValueError(mode)
    for r in range(rows):
        o_ref[r] = s_ref[r] + extra


def build(mode, m, n=1):
    rows = _rows(m, n)
    grid = (N // pk._BLOCK,)

    def call(S):
        return pk._pallas_call(
            functools.partial(_kernel, m=m, n=n, mode=mode),
            grid=grid,
            in_specs=[pk._spec((rows,))],
            out_specs=pk._spec((rows,)),
            out_shape=jax.ShapeDtypeStruct(
                (rows, N // pk._LANES, pk._LANES), jnp.float32
            ),
            scratch_shapes=[pk._l_scratch(m, True, jnp.float32)],
        )(S)

    return call


def scan_time(fn, x0, iters=ITERS):
    """Marginal per-iteration time: (T(iters) - T(iters//2)) / (iters/2).

    Subtracts the axon per-dispatch overhead (~30 ms, noisy) that a
    single-dispatch measurement would fold into the per-call figure.
    ``float(...)`` forces a host readback — ``block_until_ready`` alone
    returns before remote execution finishes on this harness.
    """

    def run_n(n):
        @jax.jit
        def run(x):
            return jax.lax.scan(lambda c, _: (fn(c), None), x, None,
                                length=n)[0]

        float(run(x0)[0, 0, 0])  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0)[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_half = run_n(iters // 2)
    t_full = run_n(iters)
    return (t_full - t_half) / (iters - iters // 2)


def main():
    m = M
    rows = _rows(m)
    key = jax.random.key(0)
    # SPD-ish stats so rsqrt/log stay finite through the scan: identity-
    # dominated triangle block, small everything else, lam<1 keeps bounded
    S = jnp.abs(jax.random.normal(key, (rows, N // 128, 128))) * 1e-3
    # strong T1 diagonal so the Cholesky chain stays finite through the
    # feedback scan (column j's packed run starts at its diagonal entry)
    tri = jnp.concatenate([
        jnp.full((1,), 10.0 if i == j else 0.01)
        for j in range(m)
        for i in range(j, m)
    ])
    S = S.at[m : m + m * (m + 1) // 2].add(tri[:, None, None])
    S = S.reshape(rows, N // 128, 128)
    print(f"N={N} m={m} rows={rows} iters={ITERS}", flush=True)
    for mode in ("copy", "chol_par", "chol", "chol_subst", "update"):
        fn = build(mode, m)
        dt = scan_time(fn, S)
        print(f"{mode:12s} {dt*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
