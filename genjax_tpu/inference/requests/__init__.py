"""Inference edit requests: MH-style rejuvenation, HMC, MALA,
elliptical slice sampling, Gaussian random-walk drift."""

from genjax_tpu.inference.requests.drift import GaussianDrift
from genjax_tpu.inference.requests.elliptical import (
    EllipticalSlice,
    elliptical_slice,
)
from genjax_tpu.inference.requests.hmc import HMC, MALA, SafeHMC, selection_gradient
from genjax_tpu.inference.requests.rejuvenate import Rejuvenate

__all__ = [
    "EllipticalSlice",
    "GaussianDrift",
    "HMC",
    "MALA",
    "Rejuvenate",
    "SafeHMC",
    "elliptical_slice",
    "selection_gradient",
]
