"""Inference edit requests: MH-style rejuvenation, HMC, MALA."""

from genjax_tpu.inference.requests.hmc import HMC, MALA, SafeHMC, selection_gradient
from genjax_tpu.inference.requests.rejuvenate import Rejuvenate

__all__ = ["HMC", "MALA", "Rejuvenate", "SafeHMC", "selection_gradient"]
