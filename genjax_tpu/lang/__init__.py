"""Generative function languages."""

from genjax_tpu.lang.interop import trace
from genjax_tpu.lang.static import (
    AddressReuse,
    MissingAddress,
    StaticGenerativeFunction,
    StaticRequest,
    StaticTrace,
    gen,
)

__all__ = [
    "AddressReuse",
    "MissingAddress",
    "StaticGenerativeFunction",
    "StaticRequest",
    "StaticTrace",
    "gen",
    "trace",
]
