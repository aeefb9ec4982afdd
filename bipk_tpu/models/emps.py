"""EMPS — electro-mechanical positioning system (real-measurement example).

Rigid-body model ``q'' = (tau - F)/M`` with unknown friction ``F(q')``
learned from measured joint positions; a classic-PGAS baseline learns the
*full* two-dimensional transition with a 729-function basis over normalized
``(q, q', tau)``. Parity target: ``/root/reference/src/EMPS.py``.

The benchmark files ``DATA_EMPS.mat`` / ``DATA_EMPS_PULSES.mat`` are
external downloads in the reference (``/root/reference/README.md:17``) and
absent from the snapshot; :func:`load_dataset` uses them when present and
otherwise generates a surrogate dataset from the published linear model
(``/root/reference/src/EMPS.py:169-173``) plus the same preprocessing
(Butterworth filtering, central differences, x10 decimation) so the whole
pipeline stays testable.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import basis as basis_ops
from bipk_tpu.ops import mniw
from bipk_tpu.ops.integrators import rk4_step

MASS = 95.11

# noise (parity: /root/reference/src/EMPS.py:73-75)
R = np.diag([1e-4])
Q = np.diag([1e-6, 1e-7])
P0 = np.diag([1e-5, 1e-6])
P0_F = np.diag([1e-12])


def _rhs(x, tau, friction):
    return jnp.hstack([x[1], (tau - friction) / MASS])


def transition(x, tau, friction, dt):
    return rk4_step(_rhs, x, dt, tau, friction)


def _linear_rhs(x, tau):
    """Published linear benchmark model
    (parity: /root/reference/src/EMPS.py:169-173)."""
    ddq = (tau - 203.5 * x[1] - 20.39 * jnp.sign(x[1]) + 3.16) / MASS
    return jnp.hstack([x[1], ddq])


def linear_transition(x, tau, dt):
    return rk4_step(_linear_rhs, x, dt, tau)


class EMPSData(NamedTuple):
    time: np.ndarray  # (T,)
    states: np.ndarray  # (T, 2) filtered position + derived velocity
    observations: np.ndarray  # (T, 1) measured position
    inputs: np.ndarray  # (T, 1) motor torque
    dt: float
    synthetic: bool


def central_difference(x: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Central-difference derivative with one-sided ends
    (parity: /root/reference/src/EMPS.py:17-37)."""
    dxdt = np.zeros_like(x)
    dxdt[0] = (x[1] - x[0]) / (t[1] - t[0])
    dxdt[1:-1] = (x[2:] - x[:-2]) / (t[2:] - t[:-2])
    dxdt[-1] = (x[-1] - x[-2]) / (t[-1] - t[-2])
    return dxdt


def _preprocess(q_measured, t, torque, decimation=10):
    """Low-pass the position, differentiate, decimate.

    Parity: ``/root/reference/src/EMPS.py:52-64`` (4th-order Butterworth at
    100 Hz on a 500 Hz Nyquist, filtfilt, x10 decimation).
    """
    import scipy.signal

    sos = scipy.signal.butter(4, 100 / 500, btype="lowpass", output="sos")
    q_filt = scipy.signal.sosfiltfilt(sos, q_measured)
    dq = central_difference(q_filt, t)
    states = np.vstack([q_filt, dq]).T[0:-1:decimation]
    time = t[0:-1:decimation]
    obs = q_measured[0:-1:decimation][:, None]
    inputs = torque[0:-1:decimation][:, None]
    return time, states, obs, inputs


def synthesize_measurements(
    seed: int = 0, n_raw: int = 24_000, dt_raw: float = 0.001
):
    """Surrogate raw measurements from the published linear model.

    A band-limited random torque excites the linear EMPS model at 1 kHz;
    the 'measured' position adds encoder-scale noise. Stands in for the
    absent ``DATA_EMPS.mat`` download.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_raw) * dt_raw
    # smooth random torque: low-pass filtered white noise, amplitude ~100
    raw = rng.standard_normal(n_raw)
    kernel = np.exp(-0.5 * (np.linspace(-3, 3, 501)) ** 2)
    torque = 120.0 * np.convolve(raw, kernel / kernel.sum(), mode="same")
    torque = torque / max(1e-9, np.abs(torque).max()) * 120.0

    def step(x, tau):
        nxt = linear_transition(x, tau, dt_raw)
        return nxt, nxt

    _, traj = jax.jit(
        lambda tau: jax.lax.scan(step, jnp.zeros(2), tau)
    )(jnp.asarray(torque[:-1]))
    xs = np.concatenate([np.zeros((1, 2)), np.asarray(traj)])
    qs = xs[:, 0] + rng.standard_normal(n_raw) * 1e-5
    return t, qs, torque


def load_dataset(
    data_dir: str | None = None, kind: str = "train", seed: int = 0
) -> EMPSData:
    """Load real EMPS measurements if available, else synthesize.

    ``kind`` is ``"train"`` (``DATA_EMPS.mat``) or ``"pulses"``
    (``DATA_EMPS_PULSES.mat``, the validation set).
    """
    fname = "DATA_EMPS.mat" if kind == "train" else "DATA_EMPS_PULSES.mat"
    path = os.path.join(data_dir, fname) if data_dir else None
    if path and os.path.exists(path):
        import scipy.io

        data = scipy.io.loadmat(path)
        t = data["t"].flatten()
        q = data["qm"].flatten()
        torque = (data["vir"] * data["gtau"]).flatten()
        synthetic = False
    else:
        t, q, torque = synthesize_measurements(
            seed=seed if kind == "train" else seed + 1
        )
        synthetic = True
    time, states, obs, inputs = _preprocess(q, t, torque)
    return EMPSData(
        time=time,
        states=states,
        observations=obs,
        inputs=inputs,
        dt=float(time[1] - time[0]),
        synthetic=synthetic,
    )


@dataclasses.dataclass(frozen=True)
class EMPSConfig:
    n_basis: int = 9
    velocity_domain: float = 0.2
    magnitude: float = 20.0
    prior_df: float = 2.0
    prior_row_scale: float = 4.0
    n_particles: int = 200
    n_gibbs: int = 800
    forgetting_factor: float = 0.999
    baseline_magnitude: float = 20.0
    seed: int = 12345678

    @property
    def lengthscale(self) -> float:
        return 2 * self.velocity_domain / self.n_basis

    @property
    def n_basis_baseline(self) -> int:
        return self.n_basis**3


@dataclasses.dataclass(frozen=True)
class EMPSModel:
    config: EMPSConfig
    data: EMPSData
    ssm: SSM
    gp: GPNode
    basis: basis_ops.HilbertBasis
    baseline_basis: basis_ops.HilbertBasis
    baseline_prior: mniw.MNIW

    @property
    def x0(self) -> np.ndarray:
        return np.array([float(self.data.observations[0, 0]), 0.0])

    @property
    def p0(self) -> np.ndarray:
        return P0

    def baseline_basis_fn(self, state, inp):
        """Normalized full-transition basis for the classic-PGAS baseline
        (parity: /root/reference/src/EMPS.py:110-114)."""
        z = jnp.hstack([state, jnp.atleast_1d(inp)[:1]]) / jnp.asarray(
            [0.4, 0.4, 160.0], dtype=state.dtype
        )
        return self.baseline_basis.eigen_fn(z)


def make_model(
    config: EMPSConfig = EMPSConfig(),
    data: EMPSData | None = None,
    data_dir: str | None = "data",
) -> EMPSModel:
    if data is None:
        data = load_dataset(data_dir=data_dir, kind="train")
    dt = data.dt

    hb = basis_ops.make_hilbert_basis(
        config.n_basis,
        np.array([-config.velocity_domain, config.velocity_domain]),
        config.lengthscale,
        config.magnitude,
    )
    prior = mniw.natural_from_standard(
        np.zeros((1, config.n_basis)),
        np.diag(np.asarray(hb.spectral_density)),
        np.eye(1) * config.prior_row_scale,
        config.prior_df,
    )

    n_base = config.n_basis_baseline
    hb_base = basis_ops.make_hilbert_basis(
        n_base,
        np.array([[-1.0, 1.0]] * 3),
        0.5 / n_base,
        config.baseline_magnitude,
    )
    baseline_prior = mniw.natural_from_standard(
        np.zeros((2, n_base)),
        np.diag(np.asarray(hb_base.spectral_density)),
        np.eye(2),
        2.0,
    )

    ssm = SSM(
        transition=lambda state, inp, *iv: transition(
            state, inp[0], iv[0][0], dt
        ),
        output=lambda state, inp, *iv: state[0],
        process_noise=Q,
        output_noise=R,
    )
    gp = GPNode(
        basis_fn=lambda state, inp: hb.eigen_fn(state[1]),
        basis_fn_bl=lambda state, inp: hb.eigen_fn_bl(state[1]),
        prior=prior,
        init_mean=np.zeros(1),
        init_cov=P0_F,
    )
    return EMPSModel(
        config=config,
        data=data,
        ssm=ssm,
        gp=gp,
        basis=hb,
        baseline_basis=hb_base,
        baseline_prior=baseline_prior,
    )


def validation_rmse(
    model: EMPSModel,
    gp_mean_alg2: jax.Array,
    gp_mean_pgas: jax.Array | None = None,
    data: EMPSData | None = None,
):
    """Roll the identified models forward on the validation pulses.

    Parity: ``EMPS_Validation_Simulation``
    (``/root/reference/src/EMPS.py:129-151``) as a fused scan. Returns the
    position RMSE of the Algorithm-2 model and (optionally) of the classic
    PGAS full-transition model.
    """
    if data is None:
        data = load_dataset(data_dir=None, kind="pulses")
    dt = data.dt
    obs = jnp.asarray(data.observations[:, 0])
    tau = jnp.asarray(data.inputs[:, 0])
    x0 = jnp.array([obs[0], 0.0], dtype=obs.dtype)

    def step_alg2(x, tau_t):
        friction = (gp_mean_alg2 @ model.basis.eigen_fn(x[1]))[0]
        x_next = transition(x, tau_t, friction, dt)
        return x_next, x_next[0]

    _, q_alg2 = jax.lax.scan(step_alg2, x0, tau[:-1])
    q_alg2 = jnp.concatenate([x0[:1], q_alg2])
    rmse_alg2 = jnp.sqrt(jnp.mean((q_alg2 - obs) ** 2))

    if gp_mean_pgas is None:
        return float(rmse_alg2), None

    def step_pgas(x, tau_t):
        x_next = gp_mean_pgas @ model.baseline_basis_fn(x, tau_t[None])
        return x_next, x_next[0]

    _, q_pgas = jax.lax.scan(step_pgas, x0, tau[:-1])
    q_pgas = jnp.concatenate([x0[:1], q_pgas])
    rmse_pgas = jnp.sqrt(jnp.mean((q_pgas - obs) ** 2))
    return float(rmse_alg2), float(rmse_pgas)
