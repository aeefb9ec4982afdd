"""L1 math kernels: MNIW conjugate algebra, Hilbert-GP basis, resampling."""

from bipk_tpu.ops import basis, gaussian, integrators, mniw, resampling
from bipk_tpu.ops.basis import HilbertBasis, make_hilbert_basis, se_spectral_density
from bipk_tpu.ops.mniw import (
    MNIW,
    MNIWFactor,
    Predictive,
    factor_mean_at,
    factor_predictive,
    factorize,
    log_base_measure,
    natural_from_standard,
    posterior_mean,
    predictive,
    sample_parameters,
    sample_predictive,
    standard_from_natural,
    suff_stat,
)
from bipk_tpu.ops.resampling import (
    categorical_from_weights,
    effective_sample_size,
    reconstruct_trajectory,
    systematic,
)

__all__ = [
    "basis",
    "gaussian",
    "integrators",
    "mniw",
    "resampling",
    "HilbertBasis",
    "make_hilbert_basis",
    "se_spectral_density",
    "MNIW",
    "MNIWFactor",
    "Predictive",
    "factor_mean_at",
    "factor_predictive",
    "factorize",
    "log_base_measure",
    "natural_from_standard",
    "posterior_mean",
    "predictive",
    "sample_parameters",
    "sample_predictive",
    "standard_from_natural",
    "suff_stat",
    "categorical_from_weights",
    "effective_sample_size",
    "reconstruct_trajectory",
    "systematic",
]
