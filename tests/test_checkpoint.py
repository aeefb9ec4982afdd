"""Checkpoint save/resume round trip (bipk_tpu.utils.checkpoint)."""

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.utils import checkpoint

import pytest

# multi-minute on the 1-vCPU CI host (mesh compiles, GSPMD,
# subprocess fixtures); excluded from the core tier
pytestmark = pytest.mark.slow


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
    cb = checkpoint.PeriodicCheckpointer(path, every=3)
    key = jax.random.key(0)
    for k in range(1, 8):
        key, _ = jax.random.split(key)  # evolving chain key
        cb(k, key, {"k": jnp.asarray(k)})
    step, saved_key, payload = checkpoint.load(path)
    assert step == 6  # last multiple of 3
    assert int(payload["k"]) == 6
    # the saved key is the CURRENT key at step 6, not the initial one
    expect = jax.random.key(0)
    for _ in range(6):
        expect, _ = jax.random.split(expect)
    np.testing.assert_array_equal(
        jax.random.key_data(saved_key), jax.random.key_data(expect)
    )


def _toy_gibbs_setup():
    from bipk_tpu.algorithms import build_apf, build_gibbs
    from bipk_tpu.models import toy
    from bipk_tpu.utils.matio import sample_reference_trajectory

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
        model.ssm, (model.gp,), 40, 8, dtype=jnp.float64, fused=False
    )
    return run, key, Y, inputs, model, ref_state, ref_iv


def test_gibbs_host_loop_writes_checkpoints(tmp_path):
    """The host-loop Gibbs sampler checkpoints its full chain state."""
    run, key, Y, inputs, model, ref_state, ref_iv = _toy_gibbs_setup()
    path = str(tmp_path / "gibbs.pkl")
    out = run(
        key, Y, inputs, model.x0, model.p0, ref_state, ref_iv,
        checkpoint_path=path, checkpoint_every=2,
    )
    assert out.states.shape == (15, 8, 1)
    step, _, payload = checkpoint.load(path)
    assert step == 6  # last multiple of 2 before the final iteration (7)
    assert np.asarray(payload["ref"][0]).shape == (15, 1)
    assert len(payload["states"]) == 7  # init draw + 6 sweeps


def test_gibbs_resume_continues_chain_exactly(tmp_path):
    """Kill mid-run, resume, and the chain CONTINUES (not replays):

    the resumed run must be bitwise identical to an uninterrupted run,
    which requires the checkpoint to carry the post-sweep RNG key.
    """
    run, key, Y, inputs, model, ref_state, ref_iv = _toy_gibbs_setup()

    full = run(key, Y, inputs, model.x0, model.p0, ref_state, ref_iv)

    path = str(tmp_path / "crash.pkl")
    calls = {"n": 0}

    class Boom(RuntimeError):
        pass

    def crash_at_5(k, ref):
        calls["n"] = k
        if k == 5:
            raise Boom()

    try:
        run(
            key, Y, inputs, model.x0, model.p0, ref_state, ref_iv,
            callback=crash_at_5, checkpoint_path=path, checkpoint_every=2,
        )
        raise AssertionError("expected simulated crash")
    except Boom:
        pass
    assert calls["n"] == 5
    step, _, _ = checkpoint.load(path)
    assert step == 4  # last checkpoint before the crash

    resumed = run(
        key, Y, inputs, model.x0, model.p0, ref_state, ref_iv,
        checkpoint_path=path, checkpoint_every=2,
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.states), np.asarray(full.states)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.log_likelihood), np.asarray(full.log_likelihood)
    )
