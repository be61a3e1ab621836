"""`Mask`: a sum type for possibly-invalid values.

Capability parity with reference
`_src/core/generative/functional_types.py:43-368`: construction/validation,
`build`, `maybe_mask`, `flatten`, `unmask`, `primal_flag`, indexing, and the
`or`/`xor`/`invert` combinator algebra (including vectorized flags).

The value/flag pair representation is dense and vectorization-friendly:
under `vmap`/`scan` the flag picks up batch dimensions as a prefix of the
value's shape, which is exactly the layout a TPU wants (select on dense
arrays rather than data-dependent control flow).
"""

import functools
from typing import Generic, TypeVar

import jax.numpy as jnp
import jax.tree_util as jtu
from jax import Array
from jax.experimental import checkify

from genjax_tpu.core.checkify import optional_check
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.staging import FlagOp, tree_choose
from genjax_tpu.core.typing import ArrayLike, Flag

R = TypeVar("R")


@Pytree.dataclass(match_args=True, init=False)
class Mask(Generic[R], Pytree):
    """Wraps a value in a Boolean validity flag.

    A `Mask` with a `False` flag denotes data that must not participate in
    inference computations. A non-scalar flag denotes a vectorized mask: the
    flag's shape must be a prefix of every leaf's shape.

    >>> import jax.numpy as jnp
    >>> from genjax_tpu import Mask
    >>> m = Mask(3.0, jnp.asarray(True))
    >>> float(m.unmask())
    3.0
    >>> invalid = Mask(9.0, jnp.asarray(False))
    >>> float(invalid.unmask(default=-1.0))
    -1.0

    `|` keeps the left operand where it is valid:

    >>> merged = invalid | m
    >>> float(merged.unmask()), bool(merged.primal_flag())
    (3.0, True)
    """

    value: R
    flag: Flag | Diff

    def __init__(self, value: R, flag: Flag | Diff = True) -> None:
        assert not isinstance(value, Mask), (
            f"Mask should not be instantiated with another Mask! found {value}"
        )
        Mask._validate_init(value, flag)
        object.__setattr__(self, "value", value)
        object.__setattr__(self, "flag", flag)

    @staticmethod
    def _validate_init(value: R, flag: Flag | Diff) -> None:
        primal = flag.get_primal() if isinstance(flag, Diff) else flag
        f_shape = jnp.shape(primal)
        if f_shape == ():
            return
        prefix_len = len(f_shape)
        for leaf in jtu.tree_leaves(value):
            shape = jnp.shape(leaf)
            if shape[:prefix_len] != f_shape:
                raise ValueError(
                    f"Vectorized flag {flag}'s shape {f_shape} must be a "
                    f"prefix of all leaf shapes. Found {shape}."
                )

    @staticmethod
    def _validate_leaf_shapes(this: R, other: R):
        def check(x, y):
            if jnp.shape(x) != jnp.shape(y):
                raise ValueError(
                    "Cannot combine masks with different array shapes: "
                    f"{jnp.shape(x)} vs {jnp.shape(y)}"
                )

        jtu.tree_map(check, this, other)

    def _validate_mask_shapes(self, other: "Mask[R]") -> None:
        if jtu.tree_structure(self.value) != jtu.tree_structure(other.value):
            raise ValueError("Cannot combine masks with different tree structures!")
        Mask._validate_leaf_shapes(self, other)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def build(v: "R | Mask[R]", f: Flag | Diff = True) -> "Mask[R]":
        """Build a Mask; if `v` is already a Mask, flags combine by AND."""
        if isinstance(v, Mask):
            g = v.flag
            assert not isinstance(f, Diff) and not isinstance(g, Diff)
            assert FlagOp.is_scalar(f) or (jnp.shape(f) == jnp.shape(g)), (
                f"Can't build a Mask with non-matching Flag shapes "
                f"{jnp.shape(f)} and {jnp.shape(g)}"
            )
            return Mask(v.value, FlagOp.and_(f, g))
        return Mask(v, f)

    @staticmethod
    def maybe_mask(v: "R | Mask[R]", f: Flag) -> "R | Mask[R] | None":
        """Like `build`, but returns the raw value (concrete True flag) or
        None (concrete False flag) where statically possible."""
        return Mask.build(v, f).flatten()

    # -- accessors -----------------------------------------------------------

    def __getitem__(self, path) -> "Mask[R]":
        path = path if isinstance(path, tuple) else (path,)
        f = self.primal_flag()
        if isinstance(f, Array) and f.shape:
            f = f[path[: len(f.shape)]]
        v_idx = jtu.tree_map(lambda v: v[path], self.value)
        if isinstance(self.flag, Diff):
            f = Diff(f, self.flag.tangent)
        return Mask.build(v_idx, f)

    def flatten(self) -> "R | Mask[R] | None":
        flag = self.primal_flag()
        if FlagOp.concrete_false(flag):
            return None
        if FlagOp.concrete_true(flag):
            return self.value
        return self

    def unmask(self, default: R | None = None) -> R:
        """Extract the value. Unsafe without `default` unless the flag is
        valid at runtime (checked only inside `do_checkify()`)."""
        if default is None:

            def _check():
                checkify.check(
                    jnp.all(self.primal_flag()),
                    "Attempted to unmask when a mask flag (or some flag in a "
                    "vectorized mask) is False: the unmasked value is invalid.\n",
                )

            optional_check(_check)
            return self.value

        def inner(true_v: ArrayLike, false_v: ArrayLike):
            return jnp.where(self.primal_flag(), true_v, false_v)

        return jtu.tree_map(inner, self.value, default)

    def primal_flag(self) -> Flag:
        f = self.flag
        if isinstance(f, Diff):
            return f.primal
        return f

    # -- combinators ----------------------------------------------------------

    def _or_idx(self, first: Flag, second: Flag):
        """first=1,second=* -> 0; first=0,second=1 -> 1; neither -> -1."""
        return first + 2 * FlagOp.and_(FlagOp.not_(first), second) - 1

    def __or__(self, other: "Mask[R]") -> "Mask[R]":
        self._validate_mask_shapes(other)
        f1, f2 = self.primal_flag(), other.primal_flag()
        if f1 is True:
            return self
        if f1 is False:
            return other
        idx = self._or_idx(f1, f2)
        return tree_choose(idx, [self, other])

    def __xor__(self, other: "Mask[R]") -> "Mask[R]":
        self._validate_mask_shapes(other)
        f1, f2 = self.primal_flag(), other.primal_flag()
        match (f1, f2):
            case (False, False) | (True, True):
                return Mask.build(self, False)
            case (True, False):
                return self
            case (False, True):
                return other
        idx = self._or_idx(f1, f2)
        chosen = tree_choose(idx, [self.value, other.value])
        return Mask(chosen, FlagOp.xor_(f1, f2))

    def __invert__(self) -> "Mask[R]":
        not_flag = jtu.tree_map(FlagOp.not_, self.flag)
        return Mask(self.value, not_flag)

    @staticmethod
    def or_n(mask: "Mask[R]", *masks: "Mask[R]") -> "Mask[R]":
        return functools.reduce(lambda a, b: a | b, masks, mask)

    @staticmethod
    def xor_n(mask: "Mask[R]", *masks: "Mask[R]") -> "Mask[R]":
        return functools.reduce(lambda a, b: a ^ b, masks, mask)
