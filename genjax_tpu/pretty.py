"""Rendering facade (reference `genjax.pretty`)."""

from genjax_tpu.utils.pretty import pretty

__all__ = ["pretty"]
