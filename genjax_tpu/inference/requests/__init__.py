"""Inference edit requests: MH-style rejuvenation, HMC, MALA, NUTS,
elliptical slice sampling, Gaussian random-walk drift."""

from genjax_tpu.inference.requests.drift import GaussianDrift
from genjax_tpu.inference.requests.elliptical import (
    EllipticalSlice,
    elliptical_slice,
)
from genjax_tpu.inference.requests.nuts import (
    NUTS,
    NUTSInfo,
    nuts_kernel,
    nuts_warmup,
)
from genjax_tpu.inference.requests.hmc import HMC, MALA, SafeHMC, selection_gradient
from genjax_tpu.inference.requests.rejuvenate import Rejuvenate

__all__ = [
    "EllipticalSlice",
    "GaussianDrift",
    "HMC",
    "MALA",
    "NUTS",
    "NUTSInfo",
    "Rejuvenate",
    "SafeHMC",
    "elliptical_slice",
    "nuts_kernel",
    "nuts_warmup",
    "selection_gradient",
]
