"""Inference library: GenSP targets/algorithms, SMC, MCMC, VI."""

from genjax_tpu.inference import (
    abc,
    adaptation,
    chees,
    diagnostics,
    involutive,
    kalman,
    map_laplace,
    mcmc,
    nested,
    parallel_tempering,
    particle_gibbs,
    pmmh,
    psis,
    rbpf,
    rjmcmc,
    requests,
    sample,
    smc,
    smc2,
    smoothing,
    svgd,
    tempered,
    validation,
)
from genjax_tpu.inference.sp import (
    Algorithm,
    Marginal,
    SampleDistribution,
    Target,
    marginal,
)

try:
    from genjax_tpu.inference import vi  # noqa: F401

    _vi = ["vi"]
except ImportError:  # pragma: no cover - before the ADEV layer lands
    _vi = []

__all__ = [
    "Algorithm",
    "abc",
    "Marginal",
    "adaptation",
    "chees",
    "diagnostics",
    "involutive",
    "kalman",
    "map_laplace",
    "SampleDistribution",
    "Target",
    "marginal",
    "mcmc",
    "nested",
    "parallel_tempering",
    "particle_gibbs",
    "pmmh",
    "psis",
    "rbpf",
    "rjmcmc",
    "requests",
    "sample",
    "smc",
    "smc2",
    "smoothing",
    "svgd",
    "tempered",
    "validation",
    *_vi,
]
