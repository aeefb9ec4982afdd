"""Lateral vehicle dynamics — single-track model with unknown tire friction.

Learns the front and rear lateral friction curves ``mu_y(alpha)`` (two GP
nodes) inside a known single-track skeleton (yaw rate + lateral velocity),
with a tanh-squashed two-dimensional measurement. Parity target:
``/root/reference/src/Vehicle.py`` — same vehicle constants, Pacejka-style
true curve, 20 even-index Hilbert basis functions on ±30°, MNIW df 0,
sinusoidal steering at 11 m/s.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import basis as basis_ops
from bipk_tpu.ops import mniw
from bipk_tpu.ops.integrators import rk4_step

M = 1720.0
I_ZZ = 1827.5
L_F = 1.16
L_R = 1.47
G = 9.81
MU_X = 0.9
MU = 0.9
PACEJKA_B = 10.0
PACEJKA_C = 1.9
PACEJKA_E = 0.97

_MG = M * G
F_ZF = _MG * L_R / (L_F + L_R)
F_ZR = _MG * L_F / (L_F + L_R)


def mu_y_true(alpha):
    """Pacejka-style magic-formula lateral friction
    (parity: /root/reference/src/Vehicle.py:40-47)."""
    t = jnp.tan(alpha)
    return MU * jnp.sin(
        PACEJKA_C
        * jnp.arctan(
            PACEJKA_B * (1.0 - PACEJKA_E) * t
            + PACEJKA_E * jnp.arctan(PACEJKA_B * t)
        )
    )


def side_slip(x, u):
    """Front/rear side-slip angles from state ``(dpsi, v_y)`` and input
    ``(steering, v_x)`` (parity: /root/reference/src/Vehicle.py:50-57)."""
    alpha_f = u[0] - jnp.arctan((x[1] + x[0] * L_F) / u[1])
    alpha_r = -jnp.arctan((x[1] - x[0] * L_R) / u[1])
    return alpha_f, alpha_r


def _lateral_accel(x, u, mu_f, mu_r):
    return (
        F_ZF * mu_f * jnp.cos(u[0]) + F_ZR * mu_r + F_ZF * MU_X * jnp.sin(u[0])
    ) / M - u[1] * x[0]


def _rhs(x, u, mu_f, mu_r):
    dv_y = _lateral_accel(x, u, mu_f, mu_r)
    ddpsi = (
        L_F * F_ZF * mu_f * jnp.cos(u[0])
        - L_R * F_ZR * mu_r
        + L_F * F_ZF * MU_X * jnp.sin(u[0])
    ) / I_ZZ
    return jnp.hstack([ddpsi, dv_y])


def transition(x, u, mu_f, mu_r, dt):
    return rk4_step(_rhs, x, dt, u, mu_f, mu_r)


def observe(x, u, mu_f, mu_r):
    """tanh-squashed ``(yaw rate, lateral accel)`` measurement
    (parity: /root/reference/src/Vehicle.py:100-128)."""
    return jnp.tanh(jnp.hstack([x[0], _lateral_accel(x, u, mu_f, mu_r)]))


@dataclasses.dataclass(frozen=True)
class VehicleConfig:
    n_basis: int = 20
    domain_deg: float = 30.0
    lengthscale_deg: float = 2.0
    magnitude: float = 50.0
    prior_df: float = 0.0
    n_particles: int = 200
    n_gibbs: int = 800
    forgetting_factor: float = 0.999
    dt: float = 0.02
    t_end: float = 30.0
    speed: float = 11.0
    seed: int = 12345678

    @property
    def n_steps(self) -> int:
        return len(np.arange(0.0, self.t_end, self.dt))


@dataclasses.dataclass(frozen=True)
class VehicleModel:
    config: VehicleConfig
    ssm: SSM
    gps: tuple  # (front, rear) GPNode
    basis: basis_ops.HilbertBasis

    @property
    def x0(self) -> np.ndarray:
        return np.zeros((2,))

    @property
    def p0(self) -> np.ndarray:
        return np.diag([1e-4, 1e-4])


# noise (parity: /root/reference/src/Vehicle.py:194-196)
R = np.diag([0.001 / 180 * np.pi, 1e-3])
Q = np.diag([1e-8, 1e-8])
P0_MU = np.diag([1e-4])


def steering_profile(config: VehicleConfig) -> np.ndarray:
    """Windowed sinusoidal steering + constant speed
    (parity: /root/reference/src/Vehicle.py:199-208)."""
    time = np.arange(0.0, config.t_end, config.dt)
    u = np.zeros((config.n_steps, 2))
    u[:, 0] = (
        10.0
        / 180.0
        * np.pi
        * np.sin(2 * np.pi * time / 5.0)
        * np.exp(-0.5 * (time - config.t_end / 2) ** 2 / (config.t_end / 5) ** 2)
    )
    u[:, 1] = config.speed
    return u


def make_model(config: VehicleConfig = VehicleConfig()) -> VehicleModel:
    rad = np.pi / 180.0
    hb = basis_ops.make_hilbert_basis(
        config.n_basis,
        np.array([-config.domain_deg * rad, config.domain_deg * rad]),
        config.lengthscale_deg * rad,
        config.magnitude,
        idx_start=2,
        idx_step=2,
    )

    def basis_front(state, inp):
        alpha_f, _ = side_slip(state, inp)
        return hb.eigen_fn(alpha_f)

    def basis_rear(state, inp):
        _, alpha_r = side_slip(state, inp)
        return hb.eigen_fn(alpha_r)

    # batch-last variants: side_slip is plain broadcastable arithmetic,
    # so it takes the (2, N) state directly
    def basis_front_bl(state, inp):
        alpha_f, _ = side_slip(state, inp)
        return hb.eigen_fn_bl(alpha_f)

    def basis_rear_bl(state, inp):
        _, alpha_r = side_slip(state, inp)
        return hb.eigen_fn_bl(alpha_r)

    def make_prior():
        return mniw.natural_from_standard(
            np.zeros((1, config.n_basis)),
            np.diag(np.asarray(hb.spectral_density)),
            np.eye(1),
            config.prior_df,
        )

    dt = config.dt
    ssm = SSM(
        transition=lambda state, inp, *iv: transition(
            state, inp, iv[0][0], iv[1][0], dt
        ),
        output=lambda state, inp, *iv: observe(state, inp, iv[0][0], iv[1][0]),
        process_noise=Q,
        output_noise=R,
    )
    gps = tuple(
        GPNode(
            basis_fn=fn,
            basis_fn_bl=fn_bl,
            prior=make_prior(),
            init_mean=np.zeros(1),
            init_cov=P0_MU,
        )
        for fn, fn_bl in (
            (basis_front, basis_front_bl),
            (basis_rear, basis_rear_bl),
        )
    )
    return VehicleModel(config=config, ssm=ssm, gps=gps, basis=hb)


def simulate(key, config: VehicleConfig = VehicleConfig(), dtype=jnp.float32):
    """Generate synthetic data (fused scan).

    Parity: ``Vehicle_simulation``
    (``/root/reference/src/Vehicle.py:226-257``). Returns
    ``(states (T,2), observations (T,2), mu_front (T,), mu_rear (T,),
    inputs (T,2))``.
    """
    ctrl = jnp.asarray(steering_profile(config), dtype=dtype)
    chol_q = jnp.linalg.cholesky(jnp.asarray(Q, dtype=dtype))
    r_std = jnp.sqrt(jnp.diag(jnp.asarray(R, dtype=dtype)))
    dt = config.dt

    def true_friction(x, u):
        alpha_f, alpha_r = side_slip(x, u)
        return mu_y_true(alpha_f), mu_y_true(alpha_r)

    def step(carry, xs):
        x, mu_f, mu_r = carry
        u_prev, u_cur, key_t = xs
        key_w, key_v = jax.random.split(key_t)
        x_next = transition(x, u_prev, mu_f, mu_r, dt)
        x_next = x_next + chol_q @ jax.random.normal(key_w, (2,), dtype)
        mu_f_next, mu_r_next = true_friction(x_next, u_cur)
        y = observe(x_next, u_cur, mu_f_next, mu_r_next)
        y = y + jax.random.normal(key_v, (2,), dtype) * r_std
        return (x_next, mu_f_next, mu_r_next), (x_next, y, mu_f_next, mu_r_next)

    x0 = jnp.zeros((2,), dtype=dtype)
    mu_f0, mu_r0 = true_friction(x0, ctrl[0])
    keys = jax.random.split(key, config.n_steps - 1)
    _, (xs, ys, mu_f, mu_r) = jax.lax.scan(
        step, (x0, mu_f0, mu_r0), (ctrl[:-1], ctrl[1:], keys)
    )
    states = jnp.concatenate([x0[None], xs])
    observations = jnp.concatenate([jnp.zeros((1, 2), dtype=dtype), ys])
    mu_front = jnp.concatenate([mu_f0[None], mu_f])
    mu_rear = jnp.concatenate([mu_r0[None], mu_r])
    return states, observations, mu_front, mu_rear, ctrl
