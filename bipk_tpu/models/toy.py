"""Toy example — 1-D blind system identification.

True dynamics ``x_t = 10 sinc(x_{t-1}/7) + w`` with identity output; the
transition model used for inference is *pure* interface variable (no physics
knowledge). Parity target: ``/root/reference/src/Toy_Example.py`` — same
basis (40 Hilbert eigenfunctions on [-30, 30], SE lengthscale 3, magnitude
50), same MNIW prior (df 10), same noise levels, but configuration is an
explicit dataclass and data generation is a fused scan instead of
import-time side effects.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import basis as basis_ops
from bipk_tpu.ops import mniw


def f_true(x):
    """True unknown sub-function ``10 sinc(x/7)`` (normalized sinc)."""
    return 10.0 * jnp.sinc(x / 7.0)


@dataclasses.dataclass(frozen=True)
class ToyConfig:
    n_basis: int = 40
    domain: float = 30.0
    lengthscale: float = 3.0
    magnitude: float = 50.0
    prior_df: float = 10.0
    n_particles: int = 200
    n_gibbs: int = 200
    forgetting_factor: float = 1.0
    n_steps: int = 40
    obs_noise: float = 4.0
    sim_noise: float = 4.0
    init_state_cov: float = 1e-4
    seed: int = 12345678


@dataclasses.dataclass(frozen=True)
class ToyModel:
    config: ToyConfig
    ssm: SSM
    gp: GPNode
    basis: basis_ops.HilbertBasis

    @property
    def x0(self) -> np.ndarray:
        return np.zeros((1,))

    @property
    def p0(self) -> np.ndarray:
        return np.diag([self.config.init_state_cov])


def make_model(config: ToyConfig = ToyConfig()) -> ToyModel:
    hb = basis_ops.make_hilbert_basis(
        config.n_basis,
        np.array([-config.domain, config.domain]),
        config.lengthscale,
        config.magnitude,
    )
    prior = mniw.natural_from_standard(
        np.zeros((1, config.n_basis)),
        np.diag(np.asarray(hb.spectral_density)),
        np.eye(1),
        config.prior_df,
    )
    ssm = SSM(
        transition=lambda state, inp, *iv: iv[0],
        output=lambda state, inp, *iv: iv[0],
        process_noise=np.zeros((1, 1)),
        output_noise=np.diag([config.obs_noise]),
    )
    gp = GPNode(
        basis_fn=lambda state, inp: hb.eigen_fn(state),
        basis_fn_bl=lambda state, inp: hb.eigen_fn_bl(state),
        prior=prior,
        init_mean=np.asarray(f_true(np.zeros(1))),
        init_cov=np.diag([config.sim_noise]),
    )
    return ToyModel(config=config, ssm=ssm, gp=gp, basis=hb)


def simulate(key, config: ToyConfig = ToyConfig(), dtype=jnp.float32):
    """Generate synthetic data (fused scan).

    Parity: ``Toy_Example_simulation``
    (``/root/reference/src/Toy_Example.py:77-97``) — transition noise
    ``sqrt(Q)``, observation noise ``sqrt(R)``, x0 = 0.
    """
    q = jnp.sqrt(jnp.asarray(config.sim_noise, dtype=dtype))
    r = jnp.sqrt(jnp.asarray(config.obs_noise, dtype=dtype))

    def step(x, key_t):
        key_w, key_v = jax.random.split(key_t)
        x_next = f_true(x) + jax.random.normal(key_w, x.shape, dtype) * q
        y = x_next + jax.random.normal(key_v, x.shape, dtype) * r
        return x_next, (x_next, y)

    x0 = jnp.zeros((1,), dtype=dtype)
    keys = jax.random.split(key, config.n_steps - 1)
    _, (xs, ys) = jax.lax.scan(step, x0, keys)
    states = jnp.concatenate([x0[None], xs])
    observations = jnp.concatenate([jnp.zeros((1, 1), dtype=dtype), ys])
    return states, observations
