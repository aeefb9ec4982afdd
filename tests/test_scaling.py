"""Collective-structure regression for the multi-chip paths.

The per-step communication schedule must be O(1) ROUNDS regardless of
mesh size: growing the mesh may change collective ring sizes (ICI hops)
but must NOT add collective ops to the compiled program. Compile-only —
no execution — so this stays fast on the 1-vCPU CI host.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from bipk_tpu.models import toy
from bipk_tpu.parallel.mesh import particle_mesh
from bipk_tpu.parallel.sharded import build_sharded_apf

# multi-minute on the 1-vCPU CI host (mesh compiles, GSPMD,
# subprocess fixtures); excluded from the core tier
pytestmark = pytest.mark.slow

_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)\b"
)


def _collectives(compiled):
    counts = {}
    for m in _COLLECTIVE_RE.finditer(compiled.as_text()):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


@pytest.mark.parametrize("scheme", ["local", "exact"])
def test_apf_collective_count_constant_in_mesh_size(scheme):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    cfg = toy.ToyConfig(n_particles=256, n_steps=8)
    model = toy.make_model(cfg)
    key = jax.random.key(0)
    _, Y = toy.simulate(key, cfg, dtype=jnp.float32)
    inputs = jnp.zeros((cfg.n_steps, 0))

    per_mesh = {}
    for n_dev in (2, 4, 8):
        run = jax.jit(
            build_sharded_apf(
                model.ssm, (model.gp,), cfg.n_particles,
                particle_mesh(n_dev), 1.0, dtype=jnp.float32,
                resampling_scheme=scheme,
            )
        )
        compiled = run.lower(
            key, Y, inputs, model.x0, model.p0
        ).compile()
        per_mesh[n_dev] = _collectives(compiled)

    base = per_mesh[2]
    assert base, "expected collectives on a 2-device mesh"
    for n_dev in (4, 8):
        assert per_mesh[n_dev] == base, (
            f"collective structure changed with mesh size: "
            f"{per_mesh}"
        )


def test_sharded_csmc_collective_count_constant_in_mesh_size():
    """The production multi-chip PGAS path (hand-placed collectives:
    exact global systematic resampling, distributed ancestor categorical,
    ring redistribute) must keep a mesh-size-independent collective
    schedule too — previously guarded only by a bench artifact
    (``benchmarks/results_scaling_cpu_mesh.jsonl``)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from bipk_tpu.algorithms.gibbs import summed_reference_stats
    from bipk_tpu.parallel.sharded_csmc import build_sharded_csmc

    cfg = toy.ToyConfig(n_particles=256, n_steps=8)
    model = toy.make_model(cfg)
    key = jax.random.key(0)
    _, Y = toy.simulate(key, cfg, dtype=jnp.float32)
    inputs = jnp.zeros((cfg.n_steps, 0))
    # a tiny synthetic reference trajectory is enough for compile-only
    # collective counting (no execution)
    ref_state = jnp.zeros((cfg.n_steps, 1), jnp.float32)
    ref_iv = (jnp.zeros((cfg.n_steps, 1), jnp.float32),)
    ref_stats = summed_reference_stats(
        (model.gp,), ref_state, ref_iv, inputs, jnp.float32
    )

    per_mesh = {}
    for n_dev in (2, 4, 8):
        run = jax.jit(
            build_sharded_csmc(
                model.ssm, (model.gp,), cfg.n_particles,
                particle_mesh(n_dev), dtype=jnp.float32,
            )
        )
        compiled = run.lower(
            key, Y, inputs, model.x0, model.p0, ref_state, ref_iv,
            ref_stats
        ).compile()
        per_mesh[n_dev] = _collectives(compiled)

    base = per_mesh[2]
    assert base, "expected collectives on a 2-device mesh"
    for n_dev in (4, 8):
        assert per_mesh[n_dev] == base, (
            f"collective structure changed with mesh size: {per_mesh}"
        )
