"""Gaussian helpers with precomputed Cholesky factors.

The reference re-factorizes fixed noise covariances inside every jitted call
(``StateSpaceModel.draw_state`` choleskys ``process_noise`` per call,
``/root/reference/src/StateSpaceModel.py:56-73``; XLA folds constants, but we
make the precomputation explicit so the contract is clear and the factored
form is available for batched use).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from bipk_tpu.ops import batched_linalg as bla

# math, not jnp: evaluating a jnp expression at module scope would initialize
# the JAX backend as an import side effect, breaking embedders that need to
# configure the platform (e.g. force a virtual CPU mesh) before first use.
_LOG_2PI = math.log(2.0 * math.pi)


def mvn_logpdf_chol(x, mean, chol_cov) -> jax.Array:
    """Multivariate-normal log density from a lower Cholesky factor."""
    x = jnp.atleast_1d(x)
    mean = jnp.atleast_1d(mean)
    chol_cov = jnp.atleast_2d(chol_cov)
    dim = chol_cov.shape[-1]
    white = bla.solve_lower(chol_cov, x - mean)
    logdet = jnp.sum(jnp.log(jnp.diagonal(chol_cov, axis1=-2, axis2=-1)))
    return -0.5 * (dim * _LOG_2PI + jnp.sum(white * white)) - logdet


def mvn_logpdf(x, mean, cov) -> jax.Array:
    """Multivariate-normal log density (factorizes ``cov``)."""
    return mvn_logpdf_chol(x, mean, jnp.linalg.cholesky(jnp.atleast_2d(cov)))


def mvn_sample_chol(key, mean, chol_cov, shape=()) -> jax.Array:
    """Sample ``N(mean, chol chol^T)``; leading ``shape`` of iid draws."""
    mean = jnp.atleast_1d(mean)
    dim = mean.shape[-1]
    z = jax.random.normal(key, (*shape, dim), dtype=mean.dtype)
    return mean + z @ jnp.atleast_2d(chol_cov).T
