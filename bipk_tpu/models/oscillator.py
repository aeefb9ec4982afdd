"""Single-mass oscillator — mass-spring-damper with unknown restoring force.

Learns the scalar spring/damper force ``F_sd(x, dx)`` (cubic spring +
nonlinear damper) inside a known rigid-body skeleton integrated with RK4.
Parity target: ``/root/reference/src/SingleMassOscillator.py`` — same
physics constants, 41 Hilbert basis functions on ``[-7.5, 7.5]^2``, MNIW
df 3, dt 0.02, piecewise external force; configuration is explicit and data
generation is a fused scan.
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

MASS = 0.2
C1, C2 = 5.0, 2.0
D1, D2 = 0.4, 0.4


def spring_force(x):
    return C1 * x + C2 * x**3


def damper_force(dx):
    return D1 * dx / (1.0 + D2 * dx * jnp.tanh(dx))


def _rhs(x, force_ext, force_sd):
    return jnp.hstack([x[1], (force_ext - force_sd) / MASS])


def transition(x, force_ext, force_sd, dt):
    """RK4 step of the mass-spring-damper skeleton."""
    return rk4_step(_rhs, x, dt, force_ext, force_sd)


@dataclasses.dataclass(frozen=True)
class OscillatorConfig:
    n_basis: int = 41
    domain: float = 7.5
    magnitude: float = 100.0
    prior_df: float = 3.0
    n_particles: int = 200
    n_gibbs: int = 800
    forgetting_factor: float = 0.999
    dt: float = 0.02
    t_end: float = 15.0
    seed: int = 12345678

    @property
    def lengthscale(self) -> float:
        return self.domain * 2.0 / self.n_basis

    @property
    def n_steps(self) -> int:
        return len(np.arange(0.0, self.t_end, self.dt))


@dataclasses.dataclass(frozen=True)
class OscillatorModel:
    config: OscillatorConfig
    ssm: SSM
    gp: GPNode
    basis: basis_ops.HilbertBasis

    @property
    def x0(self) -> np.ndarray:
        return np.zeros((2,))

    @property
    def p0(self) -> np.ndarray:
        return np.diag([1e-4, 1e-4])


# noise (parity: /root/reference/src/SingleMassOscillator.py:89-91)
R = np.array([[1e-3]])
Q = np.diag([5e-8, 5e-9])
P0_F = np.diag([1e-12])


def external_force(config: OscillatorConfig) -> np.ndarray:
    """Piecewise gravity-step input
    (parity: /root/reference/src/SingleMassOscillator.py:95-97)."""
    steps = config.n_steps
    force = np.ones((steps, 1)) * 9.81 * MASS
    force[int(config.t_end / (3 * config.dt)) :] = 0.0
    force[int(2 * config.t_end / (3 * config.dt)) :] = -9.81 * MASS
    return force


def make_model(config: OscillatorConfig = OscillatorConfig()) -> OscillatorModel:
    hb = basis_ops.make_hilbert_basis(
        config.n_basis,
        np.array([[-config.domain, config.domain]] * 2),
        config.lengthscale,
        config.magnitude,
    )
    prior = mniw.natural_from_standard(
        np.zeros((1, config.n_basis)),
        np.diag(np.asarray(hb.spectral_density)),
        np.eye(1),
        config.prior_df,
    )
    dt = config.dt
    ssm = SSM(
        transition=lambda state, inp, *iv: transition(
            state, inp[0], iv[0][0], dt
        ),
        output=lambda state, inp, *iv: state[0],
        process_noise=Q,
        output_noise=R,
    )
    gp = GPNode(
        basis_fn=lambda state, inp: hb.eigen_fn(state),
        basis_fn_bl=lambda state, inp: hb.eigen_fn_bl(state),
        prior=prior,
        init_mean=np.zeros(1),
        init_cov=P0_F,
    )
    return OscillatorModel(config=config, ssm=ssm, gp=gp, basis=hb)


def simulate(key, config: OscillatorConfig = OscillatorConfig(), dtype=jnp.float32):
    """Generate synthetic data (fused scan).

    Parity: ``SingleMassOscillator_simulation``
    (``/root/reference/src/SingleMassOscillator.py:111-132``). Returns
    ``(states (T,2), observations (T,1), true_force (T,1), inputs (T,1))``.
    """
    force = jnp.asarray(external_force(config), dtype=dtype)
    chol_q = jnp.linalg.cholesky(jnp.asarray(Q, dtype=dtype))
    r_std = jnp.sqrt(jnp.asarray(R[0, 0], dtype=dtype))
    dt = config.dt

    def step(x, xs):
        f_ext, key_t = xs
        key_w, key_v = jax.random.split(key_t)
        f_sd = spring_force(x[0]) + damper_force(x[1])
        x_next = transition(x, f_ext[0], f_sd, dt)
        x_next = x_next + chol_q @ jax.random.normal(key_w, (2,), dtype)
        y = x_next[0] + jax.random.normal(key_v, (), dtype) * r_std
        return x_next, (x_next, y, f_sd)

    x0 = jnp.zeros((2,), dtype=dtype)
    keys = jax.random.split(key, config.n_steps - 1)
    _, (xs, ys, f_sd) = jax.lax.scan(step, x0, (force[:-1], keys))
    states = jnp.concatenate([x0[None], xs])
    observations = jnp.concatenate([jnp.zeros((1,), dtype=dtype), ys])[:, None]
    true_force = jnp.concatenate([f_sd, jnp.zeros((1,), dtype=dtype)])[:, None]
    return states, observations, true_force, force
