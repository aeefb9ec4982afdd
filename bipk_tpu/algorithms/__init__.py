"""Inference algorithms: online APF, conditional SMC, PGAS variants."""

from bipk_tpu.algorithms.apf import APFResult, build_apf
from bipk_tpu.algorithms.csmc import CSMCResult, build_csmc
from bipk_tpu.algorithms.gibbs import (
    GibbsResult,
    build_gibbs,
    summed_reference_stats,
)
from bipk_tpu.algorithms.pgas import PGASResult, build_pgas

__all__ = [
    "APFResult",
    "build_apf",
    "CSMCResult",
    "build_csmc",
    "GibbsResult",
    "build_gibbs",
    "summed_reference_stats",
    "PGASResult",
    "build_pgas",
]
