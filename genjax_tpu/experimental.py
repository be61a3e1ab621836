"""Experimental namespace (reference `genjax.experimental`): staging
ground for APIs whose shape may still change."""

from genjax_tpu.ops import fused_logsumexp, systematic_ancestors_kernel

__all__ = ["fused_logsumexp", "systematic_ancestors_kernel"]
