"""Ablation harness: which part of the APF step dominates at scale.

Builds sweep variants with individual components stubbed out and times one
200-step vehicle sweep each on the current backend. Targets the PACKED
statistics path (`bipk_tpu.algorithms.apf.build_apf`): the carry is one
(rows, N) matrix per GP, the draw+update is a single fused kernel.

Usage: ABLATE_N=32768 python benchmarks/ablate_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bipk_tpu.models import vehicle as veh
from bipk_tpu.algorithms import apf
from bipk_tpu.algorithms.apf import APFKernel
from bipk_tpu.ops import mniw, resampling

N = int(os.environ.get("ABLATE_N", 32768))


def main():
    cfg = veh.VehicleConfig(t_end=16.0)
    model = veh.make_model(cfg)
    key = jax.random.key(0)
    key, ks = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(ks, cfg, dtype=jnp.float32)
    T = Y.shape[0]
    x0 = jnp.asarray(model.x0, jnp.float32)
    p0 = jnp.asarray(model.p0, jnp.float32)

    def run_variant(name, patches):
        saved = {}
        for (obj, attr), repl in patches.items():
            saved[(obj, attr)] = (
                obj.__dict__[attr] if isinstance(obj, type) else getattr(obj, attr)
            )
            setattr(obj, attr, repl)
        try:
            run = jax.jit(
                apf.build_apf(model.ssm, model.gps, N, 0.999, dtype=jnp.float32)
            )

            def timed(y, inp):
                out = run(key, y, inp, x0, p0)
                # host readback: block_until_ready alone returns before
                # remote execution finishes on the axon harness
                float(out.ess[-1])
                rt = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = run(key, y, inp, x0, p0)
                    float(out.ess[-1])
                    rt = min(rt, time.perf_counter() - t0)
                return rt

            # marginal over the half sweep cancels the ~30 ms (noisy)
            # per-dispatch overhead of the remote harness
            h = T // 2
            rt_h = timed(Y[:h], inputs[:h])
            rt_f = timed(Y, inputs)
            per_step = (rt_f - rt_h) / (T - h)
            print(
                f"{name}: {per_step*1e3:.3f} ms/step "
                f"({N/per_step/1e6:.2f}M psps)",
                flush=True,
            )
        finally:
            for k, v in saved.items():
                setattr(k[0], k[1], v)

    run_variant("full", {})

    # resampler compute replaced by identity ancestors (gathers remain)
    def identity_resample(key, w):
        return jnp.arange(w.shape[-1], dtype=jnp.int32)

    run_variant("no-resampler", {(resampling, "systematic"): identity_resample})

    # round-2 path: separate XLA statistics gather feeding the no-gather
    # draw/update kernel (isolates the benefit of the in-kernel gather)
    def separate_gather_du(self, key, Ss, ancestors, lam, new_state, inp_cur,
                           factors=None):
        # the stubs drop emitted factors; with BIPK_REUSE_FACTOR=1 the
        # 'full' row would reuse factors while these rows silently
        # refactorize, skewing the attribution
        assert factors is None or all(f is None for f in factors), (
            "run the ablation with BIPK_REUSE_FACTOR unset"
        )
        Ss_g = self.gather_packed(Ss, ancestors, sorted_indices=True)
        return self.draw_update_all_packed(key, Ss_g, lam, new_state, inp_cur)

    run_variant(
        "separate-gather",
        {(APFKernel, "draw_update_gather_all_packed"): separate_gather_du},
    )

    # all resampling gathers removed (keeps the resampler compute): the
    # statistics skip their in-kernel gather, small payloads skip XLA's
    def no_gather_du(self, key, Ss, ancestors, lam, new_state, inp_cur,
                     factors=None):
        assert factors is None or all(f is None for f in factors), (
            "run the ablation with BIPK_REUSE_FACTOR unset"
        )
        return self.draw_update_all_packed(key, Ss, lam, new_state, inp_cur)

    def identity_gather(tree, idx):
        return tree

    run_variant(
        "no-gathers",
        {
            (APFKernel, "draw_update_gather_all_packed"): no_gather_du,
            (APFKernel, "packed_gather"): staticmethod(identity_gather),
        },
    )

    # auxiliary factorize+project kernel replaced by zero projections
    saved_fp = mniw.factorize_project_packed_bl

    def cheap_fp(S, phi, prior=None, lam=1.0, m=0, n=0, jitter=None,
                 use_pallas=None):
        Np = S.shape[-1]
        zeros = jnp.zeros((n, Np), S.dtype)
        ones = jnp.ones((Np,), S.dtype)
        return mniw.ProjectedFactor(
            zeros, ones, jnp.zeros((n, n, Np), S.dtype) + 1.0, ones, ones,
            S[-1] * lam,
        )

    run_variant(
        "no-aux-factorize", {(mniw, "factorize_project_packed_bl"): cheap_fp}
    )

    # fused gather+draw+update kernel replaced by a carry passthrough +
    # cheap draw (no gather, no factorization, no statistics update)
    def cheap_draw_update(key, S, ancestors, phi, prior=None, lam=1.0,
                          m=0, n=0, jitter=None, use_pallas=None,
                          factor=None):
        Np = ancestors.shape[-1]
        y = jax.random.normal(key, (n, Np), S.dtype)
        zeros = jnp.zeros((Np,), S.dtype)
        return S[:, :Np], y, zeros, zeros

    run_variant(
        "no-draw-update",
        {(mniw, "draw_update_gather_packed_bl"): cheap_draw_update},
    )

    # trivial basis functions
    run_variant(
        "no-basis",
        {(APFKernel, "basis_all"): lambda self, i, state, inp: jnp.zeros(
            (self.ms[i], state.shape[-1]), self.dtype
        )},
    )

    # no weighted-stats emission
    run_variant(
        "no-weighted-emit",
        {(APFKernel, "weighted_stats_packed"): lambda self, Ss, w: tuple(
            jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), self.priors[i]
            )
            for i in range(len(Ss))
        )},
    )

    # transition skeleton (RK4 physics) replaced by identity
    run_variant(
        "no-transition",
        {(APFKernel, "transition_all"): lambda self, state, inp, iv: state},
    )

    # output model + Gaussian log-lik replaced by zeros
    run_variant(
        "no-loglik",
        {(APFKernel, "log_lik_all"): lambda self, obs, state, inp, iv:
            jnp.zeros((state.shape[-1],), self.dtype)},
    )


if __name__ == "__main__":
    main()
