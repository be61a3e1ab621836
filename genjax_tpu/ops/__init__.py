"""Pallas TPU kernels for inference hot loops."""

from genjax_tpu.ops.logsumexp import fused_logsumexp
from genjax_tpu.ops.resampling import systematic_ancestors_kernel

__all__ = ["fused_logsumexp", "systematic_ancestors_kernel"]
