"""bipk_tpu — TPU-native Bayesian inference in nonlinear dynamical systems.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``VolkmannB/bayesian-inference-with-explicit-and-implicit-prior-knowledge``
(reference layout documented in SURVEY.md): joint state + GP-sub-function
identification in nonlinear state-space models via

- an online auxiliary particle filter with per-particle conjugate
  matrix-normal-inverse-Wishart (MNIW) statistics (Algorithm 1),
- particle-Gibbs-with-ancestor-sampling with marginalized GP parameters
  (Algorithms 2 + 3),
- a classic PGAS baseline with explicit parameter draws.

Design (TPU-first, not a port):

- all time recursions are single fused ``lax.scan`` sweeps (one dispatch per
  sweep instead of one per step),
- the particle axis shards over a ``jax.sharding.Mesh`` with ``psum`` weight
  normalization and local systematic resampling (``bipk_tpu.parallel``),
- the MNIW hot path factors ``prior + stats`` once per step and reuses the
  Cholesky factor for both the auxiliary posterior mean and the post-resample
  matrix-t predictive (the reference factors twice),
- precision is a configuration choice (f32 by default on TPU with jittered
  Cholesky; f64 available on CPU for validation).
"""

from bipk_tpu import algorithms, models, ops, parallel, utils

__version__ = "0.1.0"

__all__ = ["algorithms", "models", "ops", "parallel", "utils", "__version__"]
