"""Measure the reference-architecture CPU baseline for BASELINE_MEASURED.json.

The reference cannot be executed verbatim in this environment (it requires
``equinox``, which is not installed), so this harness reproduces its
*execution architecture* faithfully on the same algorithmic step:

- float64 everywhere (``/root/reference/src/__init__.py:4``),
- CPU backend,
- one jitted dispatch per time step driven by a host loop, with per-step
  traces copied to host numpy arrays and the weighted statistics reduction
  performed per step on host — exactly the dispatch/transfer pattern of
  ``Algorithm1.__call__`` (``/root/reference/src/Algorithm1.py:399-458``),
- the reference's two-factorization MNIW step (posterior mean and
  predictive each re-factorize ``prior + stats``), not this framework's
  fused single-factorization step.

Measured on the vehicle workload at BENCH-matching shapes, extrapolated
from a step subsample (the per-step cost is constant).

Usage: JAX_PLATFORMS=cpu python benchmarks/measure_cpu_baseline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bipk_tpu.models import vehicle as veh
from bipk_tpu.ops import mniw, resampling
from bipk_tpu.ops.gaussian import mvn_logpdf_chol


def reference_style_step(ssm, gps, priors, n_particles, dtype):
    """The reference's per-step computation: separate posterior-mean and
    predictive factorizations (``Algorithm1.py:212`` and ``:252``)."""
    process_chol = ssm.process_chol(dtype)
    output_chol = ssm.output_chol(dtype)
    n_gp = len(gps)
    forgetting = 0.999

    def log_lik(obs, state, inp, int_vars):
        out = jnp.atleast_1d(ssm.output(state, inp, *int_vars))
        return mvn_logpdf_chol(obs, out, output_chol)

    def step(key, obs, inp_prev, inp_cur, log_weights, state, int_vars, stats):
        stats = tuple(st.scale(forgetting) for st in stats)
        nat = tuple(
            jax.tree_util.tree_map(lambda p, s: p + s, priors[i], stats[i])
            for i in range(n_gp)
        )
        # factorization #1: per-particle posterior mean
        aux_state = jax.vmap(
            lambda x, *iv: ssm.transition(x, inp_prev, *iv)
        )(state, *int_vars)
        aux_iv = tuple(
            jnp.einsum(
                "nkm,nm->nk",
                jax.vmap(mniw.posterior_mean)(nat[i]),
                jax.vmap(lambda x: gps[i].basis_fn(x, inp_cur))(aux_state),
            )
            for i in range(n_gp)
        )
        ll_aux = jax.vmap(lambda x, *iv: log_lik(obs, x, inp_cur, iv))(
            aux_state, *aux_iv
        )
        lw_aux = ll_aux + log_weights
        key, key_res = jax.random.split(key)
        ancestors = resampling.systematic(key_res, jax.nn.softmax(lw_aux))

        key, key_state = jax.random.split(key)
        new_state = jax.vmap(
            lambda k, x, *iv: ssm.transition(x, inp_prev, *iv)
            + process_chol @ jax.random.normal(k, x.shape, dtype)
        )(
            jax.random.split(key_state, n_particles),
            state[ancestors],
            *tuple(iv[ancestors] for iv in int_vars),
        )

        # factorization #2: standard params + predictive per particle
        key, key_iv = jax.random.split(key)
        keys_gp = jax.random.split(key_iv, n_gp)
        nat_res = tuple(
            jax.tree_util.tree_map(lambda a: a[ancestors], nat[i])
            for i in range(n_gp)
        )
        new_basis = tuple(
            jax.vmap(lambda x: gps[i].basis_fn(x, inp_cur))(new_state)
            for i in range(n_gp)
        )

        def draw(k, nat_i, phi):
            std = mniw.standard_from_natural(nat_i)
            pred = mniw.predictive(*std, phi)
            return mniw.sample_predictive(k, pred)

        new_iv = tuple(
            jax.vmap(draw)(
                jax.random.split(keys_gp[i], n_particles),
                nat_res[i],
                new_basis[i],
            )
            for i in range(n_gp)
        )
        stats_res = tuple(
            jax.tree_util.tree_map(lambda a: a[ancestors], stats[i])
            for i in range(n_gp)
        )
        new_stats = tuple(
            stats_res[i] + jax.vmap(mniw.suff_stat)(new_iv[i], new_basis[i])
            for i in range(n_gp)
        )
        ll_new = jax.vmap(lambda x, *iv: log_lik(obs, x, inp_cur, iv))(
            new_state, *new_iv
        )
        new_log_weights = ll_new - ll_aux[ancestors]
        return new_log_weights, new_state, new_iv, new_stats, ancestors

    return jax.jit(step)


def main():
    n_particles = int(os.environ.get("BENCH_PARTICLES", 10_000))
    n_steps_measured = int(os.environ.get("BASELINE_STEPS", 25))
    dtype = jnp.float64

    cfg = veh.VehicleConfig(t_end=2.0)
    model = veh.make_model(cfg)
    gps = model.gps
    priors = tuple(gp.prior_as(dtype) for gp in gps)

    key = jax.random.key(0)
    key, key_sim = jax.random.split(key)
    _, Y, _, _, inputs = veh.simulate(key_sim, cfg, dtype=dtype)

    # init particles (host numpy traces like the reference)
    from bipk_tpu.algorithms.apf import init_particles

    key, key_init = jax.random.split(key)
    log_w, state, int_vars, stats = init_particles(
        key_init, model.ssm, gps, n_particles, inputs[0],
        model.x0, model.p0, dtype,
    )
    step = reference_style_step(model.ssm, gps, priors, n_particles, dtype)

    # host-driven loop with per-step numpy trace writes (reference pattern)
    state_trace = np.zeros((n_steps_measured + 1, n_particles, 2))
    state_trace[0] = np.asarray(state)
    weights_trace = np.zeros((n_steps_measured + 1, n_particles))

    # warmup (compile)
    out = step(key, Y[1], inputs[0], inputs[1], log_w, state, int_vars, stats)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for t in range(1, n_steps_measured + 1):
        key, key_t = jax.random.split(key)
        log_w, state, int_vars, stats, anc = step(
            key_t, Y[min(t, Y.shape[0] - 1)], inputs[0], inputs[1],
            log_w, state, int_vars, stats,
        )
        # host trace writes + per-step weighted stats reduction on host
        # (parity: Algorithm1.py:439-457)
        state_trace[t] = np.asarray(state)
        w = np.asarray(jax.nn.softmax(log_w))
        weights_trace[t] = w
        for i in range(len(gps)):
            np.einsum("n...,n->...", np.asarray(stats[i].T0), w)
            np.einsum("n...,n->...", np.asarray(stats[i].T1), w)
    elapsed = time.perf_counter() - t0

    psps = n_particles * n_steps_measured / elapsed
    out = {
        "cpu_reference_particle_steps_per_sec": round(psps, 1),
        "workload": "vehicle APF (2 GPs x 20 basis)",
        "n_particles": n_particles,
        "n_steps_measured": n_steps_measured,
        "elapsed_sec": round(elapsed, 3),
        "methodology": (
            "reference execution architecture: CPU float64, per-step jit "
            "dispatch from host loop, host numpy trace writes + per-step "
            "host einsum reductions, two MNIW factorizations per step "
            "(reference requires equinox, unavailable; this reproduces its "
            "dispatch pattern and per-step math on identical shapes)"
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
