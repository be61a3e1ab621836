"""Incremental computation facade (reference `genjax.incremental`)."""

from genjax_tpu.core.diff import (
    ChangeTangent,
    Diff,
    NoChange,
    UnknownChange,
    incremental,
)

__all__ = ["ChangeTangent", "Diff", "NoChange", "UnknownChange", "incremental"]
