"""Typing facade (reference `genjax.typing`)."""

from genjax_tpu.core.typing import (
    Any,
    ArrayLike,
    BoolArray,
    Callable,
    Flag,
    FloatArray,
    IntArray,
    PRNGKey,
    ScalarFlag,
    static_check_is_concrete,
    static_check_supports_grad,
)

__all__ = [
    "Any",
    "ArrayLike",
    "BoolArray",
    "Callable",
    "Flag",
    "FloatArray",
    "IntArray",
    "PRNGKey",
    "ScalarFlag",
    "static_check_is_concrete",
    "static_check_supports_grad",
]
