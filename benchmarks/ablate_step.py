"""Ablation harness: which part of the APF step dominates at scale.

Builds sweep variants with individual components stubbed out and times one
200-step vehicle sweep each on the current backend.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bipk_tpu.models import vehicle as veh
from bipk_tpu.algorithms import apf
from bipk_tpu.ops import mniw, resampling

N = int(os.environ.get("ABLATE_N", 32768))


def main():
    cfg = veh.VehicleConfig(t_end=4.0)
    model = veh.make_model(cfg)
    key = jax.random.key(0)
    key, ks = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(ks, cfg, dtype=jnp.float32)
    T = Y.shape[0]
    x0 = jnp.asarray(model.x0, jnp.float32)
    p0 = jnp.asarray(model.p0, jnp.float32)

    def run_variant(name, patches):
        saved = {}
        for (mod, attr), repl in patches.items():
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, repl)
        try:
            run = jax.jit(apf.build_apf(model.ssm, model.gps, N, 0.999, dtype=jnp.float32))
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(key, Y, inputs, x0, p0))
            ct = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(key, Y, inputs, x0, p0))
            rt = time.perf_counter() - t0
            print(
                f"{name}: compile {ct:.0f}s run {rt:.2f}s "
                f"({rt/(T-1)*1e3:.2f} ms/step, {N*(T-1)/rt/1e3:.0f}k psps)",
                flush=True,
            )
        finally:
            for k, v in saved.items():
                setattr(k[0], k[1], v)

    run_variant("full", {})

    # t-draw -> plain normal draw
    def normal_pred(key, factor, phi, use_pallas=None):
        n = factor.row_scale.shape[0]
        v = jax.scipy.linalg.solve_triangular  # noqa: placeholder unused
        import bipk_tpu.ops.batched_linalg as bla

        vv = bla.solve_lower_bl(factor.chol, phi)
        mean = jnp.stack(
            [jnp.sum(factor.white_T0[:, i] * vv, axis=0) for i in range(n)]
        )
        z = jax.random.normal(key, mean.shape, phi.dtype)
        return mean + z

    run_variant("no-t-draw", {(mniw, "sample_predictive_bl"): normal_pred})

    # no systematic resampling (identity ancestors)
    def identity_resample(key, w):
        return jnp.arange(w.shape[-1], dtype=jnp.int32)

    run_variant("no-resample", {(resampling, "systematic"): identity_resample})

    # no factorization (trivial projected factor)
    def cheap_project(stats, phi, prior=None, lam=1.0, jitter=None,
                      use_pallas=None):
        n = stats.T2.shape[0]
        N = stats.T3.shape[-1]
        zeros = jnp.zeros((n, N), stats.T0.dtype)
        ones = jnp.ones((N,), stats.T0.dtype)
        return mniw.ProjectedFactor(
            zeros, ones, stats.T2, ones, ones, stats.T3
        )

    run_variant(
        "no-factorize", {(mniw, "factorize_project_bl"): cheap_project}
    )


if __name__ == "__main__" and not os.environ.get("ABLATE_EXTRA"):
    main()


def extra_variants():
    """Additional ablations appended for scale diagnosis."""
    import types
    from bipk_tpu.algorithms.apf import APFKernel

    cfg = veh.VehicleConfig(t_end=4.0)
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
            run = jax.jit(apf.build_apf(model.ssm, model.gps, N, 0.999, dtype=jnp.float32))
            out = jax.block_until_ready(run(key, Y, inputs, x0, p0))
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(key, Y, inputs, x0, p0))
            rt = time.perf_counter() - t0
            print(f"{name}: {rt/(T-1)*1e3:.2f} ms/step", flush=True)
        finally:
            for k, v in saved.items():
                setattr(k[0], k[1], v)

    run_variant("full", {})

    def identity_gather(tree, idx):
        return tree

    run_variant("no-gathers", {(APFKernel, "gather"): staticmethod(identity_gather)})

    def zero_weighted(self, stats, w):
        return tuple(
            jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape[:-1], s.dtype), st
            )
            for st in stats
        )

    run_variant("no-weighted-stats", {(APFKernel, "weighted_stats"): zero_weighted})

    def identity_resample(key, w):
        return jnp.arange(w.shape[-1], dtype=jnp.int32)

    run_variant("no-searchsorted", {(resampling, "systematic"): identity_resample})

    def normal_pred(key, factor, phi):
        import bipk_tpu.ops.batched_linalg as bla
        n = factor.row_scale.shape[0]
        vv = bla.solve_lower_bl(factor.chol, phi)
        mean = jnp.stack([jnp.sum(factor.white_T0[:, i] * vv, axis=0) for i in range(n)])
        z = jax.random.normal(key, mean.shape, phi.dtype)
        return mean + z

    run_variant("no-t-draw", {(mniw, "sample_predictive_bl"): normal_pred})


if os.environ.get("ABLATE_EXTRA"):
    extra_variants()


def fine_variants():
    """Finer ablations: scale pass, weighted emission, basis eval, aux."""
    cfg = veh.VehicleConfig(t_end=4.0)
    model = veh.make_model(cfg)
    key = jax.random.key(0)
    key, ks = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(ks, cfg, dtype=jnp.float32)
    T = Y.shape[0]
    x0 = jnp.asarray(model.x0, jnp.float32)
    p0 = jnp.asarray(model.p0, jnp.float32)
    from bipk_tpu.algorithms.apf import APFKernel

    def run_variant(name, patches):
        saved = {}
        for (obj, attr), repl in patches.items():
            saved[(obj, attr)] = (
                obj.__dict__[attr] if isinstance(obj, type) else getattr(obj, attr)
            )
            setattr(obj, attr, repl)
        try:
            run = jax.jit(apf.build_apf(model.ssm, model.gps, N, 0.999, dtype=jnp.float32))
            out = jax.block_until_ready(run(key, Y, inputs, x0, p0))
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(key, Y, inputs, x0, p0))
            rt = time.perf_counter() - t0
            print(f"{name}: {rt/(T-1)*1e3:.2f} ms/step ({N*(T-1)/rt/1e6:.2f}M psps)", flush=True)
        finally:
            for k, v in saved.items():
                setattr(k[0], k[1], v)

    run_variant("full", {})

    # no forgetting-scale pass
    saved_scale = mniw.MNIW.scale
    run_variant("no-scale-pass", {(mniw.MNIW, "scale"): lambda self, f: self})

    # no weighted-stats emission
    run_variant(
        "no-weighted-emit",
        {(APFKernel, "weighted_stats"): lambda self, st, w: tuple(
            jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape[:-1], s.dtype), s_)
            for s_ in st
        )},
    )

    # trivial basis fns (zeros)
    run_variant(
        "no-basis",
        {(APFKernel, "basis_all"): lambda self, i, state, inp: jnp.zeros(
            (self.gps[i].prior.T1.shape[0], state.shape[-1]), self.dtype
        )},
    )

    # no stats update (gather only)
    run_variant(
        "no-stats-update",
        {(APFKernel, "update_stats"): lambda self, st, iv, basis: st},
    )

    # no auxiliary factor-mean projection (zeros aux iv)
    saved_aux = APFKernel.auxiliary
    def aux_no_mean(self, state, int_vars, factors, inp_prev, inp_cur, obs, log_weights):
        aux_state = self.transition_all(state, inp_prev, int_vars)
        aux_iv = tuple(
            jnp.zeros((self.gps[i].prior.T0.shape[1], state.shape[-1]), self.dtype)
            for i in range(self.n_gp)
        )
        ll_aux = self.log_lik_all(obs, aux_state, inp_cur, aux_iv)
        return aux_state, aux_iv, ll_aux + log_weights, ll_aux
    run_variant("no-aux-proj", {(APFKernel, "auxiliary"): aux_no_mean})


if __name__ == "__main__" and os.environ.get("ABLATE_FINE"):
    fine_variants()
