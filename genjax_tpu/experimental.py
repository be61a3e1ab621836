"""Experimental namespace (reference `genjax.experimental`): staging
ground for APIs whose shape may still change."""

from genjax_tpu.ops import (
    fused_logsumexp,
    maybe_fused_logsumexp,
    use_fused_logsumexp,
)

__all__ = ["fused_logsumexp", "maybe_fused_logsumexp", "use_fused_logsumexp"]
