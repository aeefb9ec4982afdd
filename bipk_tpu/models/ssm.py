"""State-space model and learned-function (GP node) specifications.

These are *build-time* descriptions: algorithm factories in
``bipk_tpu.algorithms`` close over them and return fused, jittable sweep
functions. Noise covariances are factored once at construction instead of
per call (the reference choleskys ``process_noise`` inside every
``draw_state``, ``/root/reference/src/StateSpaceModel.py:56-73``).

Capability parity: ``StateSpaceModel``
(``/root/reference/src/StateSpaceModel.py:8-87``) — a physics transition /
output skeleton taking the current state, the exogenous input, and one
"interface variable" per learned sub-function.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from bipk_tpu.ops import gaussian, mniw


@dataclasses.dataclass(frozen=True)
class SSM:
    """Nonlinear state-space model with injected interface variables.

    ``transition(x, u, *int_vars) -> x_next`` and
    ``output(x, u, *int_vars) -> y`` are pure jittable callables; the
    Gaussian process/output noises are fixed covariances.
    """

    transition: Callable[..., jax.Array]
    output: Callable[..., jax.Array]
    process_noise: np.ndarray
    output_noise: np.ndarray

    @property
    def state_dim(self) -> int:
        return int(np.atleast_2d(self.process_noise).shape[0])

    @property
    def obs_dim(self) -> int:
        return int(np.atleast_2d(self.output_noise).shape[0])

    @property
    def is_deterministic(self) -> bool:
        return bool(np.all(np.asarray(self.process_noise) == 0))

    def process_chol(self, dtype) -> jax.Array:
        return jnp.linalg.cholesky(
            jnp.asarray(np.atleast_2d(self.process_noise), dtype=dtype)
        )

    def output_chol(self, dtype) -> jax.Array:
        return jnp.linalg.cholesky(
            jnp.asarray(np.atleast_2d(self.output_noise), dtype=dtype)
        )

    def draw_state(self, key, state, inp, *int_vars) -> jax.Array:
        """Propagate one state through the transition + process noise.

        Parity with ``StateSpaceModel.draw_state``
        (``/root/reference/src/StateSpaceModel.py:56-73``).
        """
        nxt = self.transition(state, inp, *int_vars)
        if self.is_deterministic:
            return nxt
        chol = self.process_chol(nxt.dtype)
        z = jax.random.normal(key, nxt.shape, dtype=nxt.dtype)
        return nxt + chol @ z

    def log_likelihood(self, observation, state, inp, *int_vars) -> jax.Array:
        """Gaussian observation log density.

        Parity with ``StateSpaceModel.log_likelihood``
        (``/root/reference/src/StateSpaceModel.py:75-87``).
        """
        out = jnp.atleast_1d(self.output(state, inp, *int_vars))
        chol = self.output_chol(out.dtype)
        return gaussian.mvn_logpdf_chol(jnp.atleast_1d(observation), out, chol)


@dataclasses.dataclass(frozen=True)
class GPNode:
    """One unknown sub-function learned with a basis-expansion GP prior.

    ``basis_fn(x, u) -> phi`` evaluates the feature map at a particle state
    and exogenous input; ``prior`` is the MNIW prior in natural form;
    ``init_mean`` / ``init_cov`` parameterize the Gaussian draw of the
    initial interface-variable particles (matching the constructor contract
    at ``/root/reference/src/Algorithm1.py:27-66``).
    """

    basis_fn: Callable[[jax.Array, jax.Array], jax.Array]
    prior: mniw.MNIW
    init_mean: np.ndarray
    init_cov: np.ndarray
    # optional batch-last feature map ``(dx, N), (du,) -> (m, N)``: the
    # sweeps prefer it over vmapping ``basis_fn`` (the vmap formulation
    # lowers to compute-then-transpose on TPU, ~40 us/step/GP of pure
    # relayout at N = 32768)
    basis_fn_bl: Callable[[jax.Array, jax.Array], jax.Array] | None = None

    @property
    def out_dim(self) -> int:
        return int(np.atleast_1d(self.init_mean).shape[0])

    @property
    def basis_dim(self) -> int:
        return int(self.prior.T1.shape[0])

    def prior_as(self, dtype) -> mniw.MNIW:
        return mniw.MNIW(
            jnp.asarray(self.prior.T0, dtype=dtype),
            jnp.asarray(self.prior.T1, dtype=dtype),
            jnp.asarray(self.prior.T2, dtype=dtype),
            jnp.asarray(self.prior.T3, dtype=dtype),
        )

    def init_chol(self, dtype) -> jax.Array:
        return jnp.linalg.cholesky(
            jnp.asarray(np.atleast_2d(self.init_cov), dtype=dtype)
        )
