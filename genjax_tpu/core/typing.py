"""Type aliases and static checks (reference `_src/core/typing.py:37-135`).

We deliberately keep this light: shape/dtype checking frameworks (jaxtyping,
beartype) add Python-side overhead on every call; on the TPU path we instead
rely on JAX's own shape checking at trace time.
"""

from collections.abc import Callable, Iterable, Sequence  # noqa: F401 (re-export)
from typing import (  # noqa: F401 (re-export)
    Annotated,
    Any,
    Final,
    Generic,
    TypeAlias,
    TypeVar,
)

import jax.core
import jax.numpy as jnp
import numpy as np
from jax import Array

ArrayLike: TypeAlias = Array | np.ndarray | int | float | bool
PRNGKey: TypeAlias = Array
IntArray: TypeAlias = int | Array
FloatArray: TypeAlias = float | Array
BoolArray: TypeAlias = bool | Array

#: A `Flag` is a Boolean value which may be a concrete Python `bool` (known at
#: trace time, enabling statically pruned branches) or a traced `BoolArray`.
Flag: TypeAlias = bool | Array
ScalarFlag: TypeAlias = bool | Array

InAxes: TypeAlias = int | None | Sequence[Any]

R = TypeVar("R")


def static_check_is_concrete(x) -> bool:
    """True if `x` is not a JAX tracer."""
    return not isinstance(x, jax.core.Tracer)


def static_check_is_array(x) -> bool:
    return isinstance(x, (Array, np.ndarray)) or isinstance(x, (int, float, bool))


def static_check_supports_grad(v) -> bool:
    """True if `v` is a floating-point value (differentiable leaf)."""
    arr = jnp.asarray(v)
    return jnp.issubdtype(arr.dtype, jnp.floating)
