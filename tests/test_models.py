"""Unit tests for the example physics models (bipk_tpu.models)."""

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.models import emps, oscillator, toy, vehicle
from bipk_tpu.ops.integrators import rk4_step


def test_toy_true_function():
    # 10*sinc(x/7) with normalized sinc: f(0)=10, zeros at multiples of 7
    np.testing.assert_allclose(float(toy.f_true(0.0)), 10.0, rtol=1e-6)
    np.testing.assert_allclose(float(toy.f_true(7.0)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(toy.f_true(14.0)), 0.0, atol=1e-6)


def test_toy_simulation_reproducible():
    cfg = toy.ToyConfig(n_steps=25)
    X1, Y1 = toy.simulate(jax.random.key(3), cfg, dtype=jnp.float64)
    X2, Y2 = toy.simulate(jax.random.key(3), cfg, dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(X1), np.asarray(X2))
    assert X1.shape == (25, 1) and Y1.shape == (25, 1)


def test_oscillator_forces():
    # cubic spring: c1 x + c2 x^3 with c1=5, c2=2
    np.testing.assert_allclose(float(oscillator.spring_force(2.0)), 26.0)
    # damper at dx=0 vanishes
    np.testing.assert_allclose(float(oscillator.damper_force(0.0)), 0.0)
    # damper is odd-symmetric
    np.testing.assert_allclose(
        float(oscillator.damper_force(1.3)),
        -float(oscillator.damper_force(-1.3)),
        rtol=1e-6,
    )


def test_oscillator_transition_is_rk4():
    x = jnp.array([0.3, -0.5])
    got = oscillator.transition(x, 1.5, 0.7, 0.02)
    expect = rk4_step(
        lambda s, f, fsd: jnp.hstack([s[1], (f - fsd) / oscillator.MASS]),
        x, 0.02, 1.5, 0.7,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-6)


def test_oscillator_equilibrium():
    """At rest with external force balancing the spring, the state holds."""
    x = jnp.array([1.0, 0.0])
    f_eq = float(oscillator.spring_force(1.0))
    nxt = oscillator.transition(x, f_eq, f_eq, 0.02)
    # F_sd argument equals the spring+damper force => acceleration zero
    np.testing.assert_allclose(np.asarray(nxt), np.asarray(x), atol=1e-9)


def test_vehicle_friction_curve():
    # Pacejka-style: odd, zero at zero, saturates near mu=0.9
    assert float(vehicle.mu_y_true(0.0)) == 0.0
    np.testing.assert_allclose(
        float(vehicle.mu_y_true(0.1)),
        -float(vehicle.mu_y_true(-0.1)),
        rtol=1e-6,
    )
    assert 0.7 < float(vehicle.mu_y_true(0.15)) <= 0.95


def test_vehicle_side_slip_signs():
    # pure yaw rate: front slips negative (vy_f>0), rear positive
    x = jnp.array([0.5, 0.0])  # dpsi=0.5, v_y=0
    u = jnp.array([0.0, 11.0])
    a_f, a_r = vehicle.side_slip(x, u)
    assert float(a_f) < 0 < float(a_r)
    # straight rolling: both zero
    a_f0, a_r0 = vehicle.side_slip(jnp.zeros(2), u)
    assert float(a_f0) == 0.0 and float(a_r0) == 0.0


def test_vehicle_observation_bounded():
    x = jnp.array([5.0, 3.0])
    u = jnp.array([0.2, 11.0])
    y = vehicle.observe(x, u, 0.9, 0.9)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh squashed


def test_vehicle_simulation_shapes():
    cfg = vehicle.VehicleConfig(t_end=0.5)
    X, Y, mu_f, mu_r, ctrl = vehicle.simulate(
        jax.random.key(0), cfg, dtype=jnp.float64
    )
    T = cfg.n_steps
    assert X.shape == (T, 2) and Y.shape == (T, 2)
    assert mu_f.shape == (T,) and ctrl.shape == (T, 2)
    assert np.all(np.abs(np.asarray(mu_f)) <= vehicle.MU + 1e-6)


def test_emps_linear_model_straight_line():
    """Zero torque, zero friction offset => constant-velocity rigid body."""
    x = jnp.array([0.0, 0.1])
    nxt = emps.transition(x, 0.0, 0.0, 0.01)
    np.testing.assert_allclose(float(nxt[0]), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(nxt[1]), 0.1, rtol=1e-6)


def test_emps_preprocessing_and_surrogate():
    data = emps.load_dataset(data_dir=None, kind="train", seed=0)
    assert data.synthetic
    assert data.states.shape[1] == 2
    assert data.observations.shape[0] == data.inputs.shape[0]
    # decimated at x10 of a 1 kHz signal
    np.testing.assert_allclose(data.dt, 0.01, rtol=1e-6)
    # filtered position tracks the measured one
    err = data.states[:, 0] - data.observations[:, 0]
    assert np.abs(err).max() < 1e-2


def test_emps_central_difference():
    t = np.linspace(0.0, 1.0, 101)
    x = np.sin(2 * np.pi * t)
    dx = emps.central_difference(x, t)
    expect = 2 * np.pi * np.cos(2 * np.pi * t)
    np.testing.assert_allclose(dx[1:-1], expect[1:-1], atol=0.05)


def test_emps_validation_rmse_perfect_model():
    """Feeding the true (linear-model) friction coefficients through the
    validation rollout reproduces the surrogate data closely."""
    model = emps.make_model(data_dir=None)
    val = emps.load_dataset(data_dir=None, kind="pulses")
    # learned mean that reproduces the linear model friction on the basis:
    # fit F(dq) = 203.5 dq + 20.39 sign(dq) - 3.16 by least squares
    import jax as j

    grid = np.linspace(-0.19, 0.19, 301)
    phis = np.asarray(
        j.vmap(lambda v: model.basis.eigen_fn(v))(jnp.asarray(grid))
    )
    target = 203.5 * grid + 20.39 * np.sign(grid) - 3.16
    coef, *_ = np.linalg.lstsq(phis, target, rcond=None)
    rmse, _ = emps.validation_rmse(model, jnp.asarray(coef[None, :]), None, data=val)
    # the 9 smooth basis functions cannot represent the sign(dq)
    # discontinuity of the surrogate's friction, and the validation is an
    # OPEN-LOOP double integration over thousands of steps, so even the
    # least-squares-optimal coefficients drift (rmse ~6.3). This pins the
    # model-class optimum: the Gibbs sampler's full-scale result (6.35)
    # matches it, i.e. inference reaches the representable optimum.
    assert 1.0 < rmse < 12.0, rmse


def test_emps_real_measurement_ingest(tmp_path):
    """Drive the real-data ``loadmat`` branch with a fixture `.mat` in the
    documented ``DATA_EMPS.mat`` format: keys ``t``/``qm`` (column
    vectors), ``vir`` (voltage input reference, column vector), ``gtau``
    (scalar drive gain) — the shapes/keys the reference consumes at
    ``/root/reference/src/EMPS.py:49-64,79``. Checks the branch is taken
    (not the surrogate), the torque is ``vir * gtau``, and the
    Butterworth + central-difference + x10-decimation preprocessing
    matches the surrogate path's on the same raw signal."""
    import scipy.io

    t, q, torque = emps.synthesize_measurements(seed=3, n_raw=4000)
    gtau = 35.15
    scipy.io.savemat(
        tmp_path / "DATA_EMPS.mat",
        {
            # real files store column vectors + a scalar gain
            "t": t[:, None],
            "qm": q[:, None],
            "vir": (torque / gtau)[:, None],
            "gtau": np.array([[gtau]]),
        },
    )
    data = emps.load_dataset(data_dir=str(tmp_path), kind="train")
    assert not data.synthetic
    expect_time, expect_states, expect_obs, expect_inputs = (
        emps._preprocess(q, t, torque)
    )
    np.testing.assert_allclose(data.time, expect_time, rtol=1e-12)
    np.testing.assert_allclose(data.states, expect_states, rtol=1e-9)
    np.testing.assert_allclose(data.observations, expect_obs, rtol=1e-12)
    np.testing.assert_allclose(data.inputs, expect_inputs, rtol=1e-9)
    assert data.observations.shape == (400, 1)
    np.testing.assert_allclose(data.dt, 0.01, rtol=1e-9)

    # the pulses (validation) file takes the same branch
    scipy.io.savemat(
        tmp_path / "DATA_EMPS_PULSES.mat",
        {
            "t": t[:, None],
            "qm": q[:, None],
            "vir": (torque / gtau)[:, None],
            "gtau": np.array([[gtau]]),
        },
    )
    val = emps.load_dataset(data_dir=str(tmp_path), kind="pulses")
    assert not val.synthetic
    np.testing.assert_allclose(val.inputs, expect_inputs, rtol=1e-9)
