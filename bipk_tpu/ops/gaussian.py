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


def student_t(key, df, shape, dtype) -> jax.Array:
    """Exact Student-t draws by the rejection-free polar method.

    The radius R of the standard *bivariate* spherical t distribution has
    survival function ``P(R > r) = (1 + r^2/nu)^{-nu/2}`` (closed-form
    inverse), and the 1-D marginal of a spherical multivariate t keeps the
    same degrees of freedom — so

        t = sqrt(nu * (u^{-2/nu} - 1)) * cos(2 pi v),   u, v ~ U(0, 1)

    is an exact t_nu sample (Bailey 1994, polar t generation). Replaces
    ``jax.random.t`` in the filter hot path: the stock sampler draws the
    chi-square mixing variable by gamma *rejection sampling*, which lowers
    to an XLA while-loop costing ~0.15 ms/step inside the vehicle cSMC
    sweep at N = 10240 on v5e; this is a handful of fusable transcendental
    ops. Same distribution, different stream (parity is Monte-Carlo
    statistical, as for all RNG in the rebuild — SURVEY.md §7 hard-parts).
    """
    key_u, key_v = jax.random.split(key)
    df = jnp.asarray(df, dtype=dtype)
    # u in (0, 1]: 1 - uniform[0, 1) avoids u = 0 -> overflow in u^{-2/nu}
    u = 1.0 - jax.random.uniform(key_u, shape, dtype)
    v = jax.random.uniform(key_v, shape, dtype)
    r = jnp.sqrt(df * jnp.expm1(-(2.0 / df) * jnp.log(u)))
    return r * jnp.cos((2.0 * math.pi) * v)
