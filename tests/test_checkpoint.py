"""Checkpoint save/resume round trip (bipk_tpu.utils.checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.utils import checkpoint


def test_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.pkl")
    key = jax.random.key(42)
    payload = {
        "traj": jnp.arange(12.0).reshape(3, 4),
        "stats": (jnp.ones((2, 2)), jnp.asarray(3.0)),
    }
    checkpoint.save(path, 17, key, payload)
    step, key2, loaded = checkpoint.load(path)
    assert step == 17
    np.testing.assert_array_equal(
        jax.random.key_data(key), jax.random.key_data(key2)
    )
    np.testing.assert_allclose(loaded["traj"], np.arange(12.0).reshape(3, 4))
    np.testing.assert_allclose(loaded["stats"][0], np.ones((2, 2)))
    # the restored key produces the same stream
    a = jax.random.normal(jax.random.fold_in(key, 1), (3,))
    b = jax.random.normal(jax.random.fold_in(key2, 1), (3,))
    np.testing.assert_allclose(a, b)


def test_load_missing_returns_none(tmp_path):
    assert checkpoint.load(str(tmp_path / "nope.pkl")) is None


def test_periodic_checkpointer(tmp_path):
    path = str(tmp_path / "p.pkl")
    cb = checkpoint.PeriodicCheckpointer(path, jax.random.key(0), every=3)
    for k in range(1, 8):
        cb(k, {"k": jnp.asarray(k)})
    step, _, payload = checkpoint.load(path)
    assert step == 6  # last multiple of 3
    assert int(payload["k"]) == 6


def test_gibbs_host_loop_with_checkpointing(tmp_path):
    """The host-loop Gibbs sampler drives the checkpoint callback."""
    from bipk_tpu.algorithms import build_gibbs
    from bipk_tpu.models import toy
    from bipk_tpu.utils.matio import sample_reference_trajectory
    from bipk_tpu.algorithms import build_apf

    cfg = toy.ToyConfig(n_particles=40, n_steps=15)
    model = toy.make_model(cfg)
    key = jax.random.key(0)
    key, key_sim = jax.random.split(key)
    X, Y = toy.simulate(key_sim, cfg, dtype=jnp.float64)
    inputs = jnp.zeros((cfg.n_steps, 0))
    apf = jax.jit(
        build_apf(model.ssm, (model.gp,), 40, 1.0, dtype=jnp.float64)
    )
    key, key_a, key_t = jax.random.split(key, 3)
    res = apf(key_a, Y, inputs, model.x0, model.p0)
    ref_state, ref_iv = sample_reference_trajectory(key_t, res)

    run = build_gibbs(
        model.ssm, (model.gp,), 40, 6, dtype=jnp.float64, fused=False
    )
    path = str(tmp_path / "gibbs.pkl")
    cb = checkpoint.PeriodicCheckpointer(path, key, every=2)
    out = run(key, Y, inputs, model.x0, model.p0, ref_state, ref_iv, callback=cb)
    assert out.states.shape == (15, 6, 1)
    step, _, payload = checkpoint.load(path)
    assert step == 4
    # payload carries the (state traj, iv trajs, summed stats) draw
    assert np.asarray(payload[0]).shape == (15, 1)
