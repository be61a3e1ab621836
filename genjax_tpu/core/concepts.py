"""Core GFI type vocabulary: `Weight`, `Score`, `Arguments`, `Argdiffs`,
`Retdiff`, and the `EditRequest` hierarchy root.

Capability parity with reference `_src/core/generative/concepts.py:48-168`.
"""

from typing import TYPE_CHECKING, Any, TypeVar

from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import FloatArray, IntArray, PRNGKey

if TYPE_CHECKING:
    pass

R = TypeVar("R")

Weight = FloatArray
"""A log density ratio arising from proper weighting / SMCP3 moves."""

Score = FloatArray
"""A log density (or density estimate) of a trace's sample."""

Arguments = tuple
"""The type of argument tuples to generative functions."""

Argdiffs = tuple
"""Argument values with attached change tangents (`Diff` leaves)."""

Retdiff = Any
"""Return values with attached change tangents (`Diff` leaves)."""


class EditRequest(Pytree):
    """A request for an SMCP3 move on a trace.

    Responding to an `EditRequest` requires the generative function (or the
    request itself) to implement a sound SMCP3 (K, L) kernel pair; the
    returned weight is the incremental importance weight of the move.
    """

    def edit(
        self,
        key: PRNGKey,
        tr,
        argdiffs: Argdiffs,
    ) -> tuple[Any, Weight, Retdiff, "EditRequest"]:
        raise NotImplementedError

    def dimap(self, /, *, pre=lambda v: v, post=lambda v: v):
        from genjax_tpu.core.requests import DiffAnnotate

        return DiffAnnotate(self, argdiff_fn=pre, retdiff_fn=post)

    def map(self, post):
        return self.dimap(post=post)

    def contramap(self, pre):
        return self.dimap(pre=pre)


class PrimitiveEditRequest(EditRequest):
    """An edit request whose implementation is deferred to the generative
    function's `edit` method."""

    def edit(self, key: PRNGKey, tr, argdiffs: Argdiffs):
        gen_fn = tr.get_gen_fn()
        return gen_fn.edit(key, tr, self, argdiffs)


@Pytree.dataclass(match_args=True)
class IndexRequest(PrimitiveEditRequest):
    """Request an edit at a particular index of a vector combinator
    (O(1) slice-edit-scatter instead of a full re-scan)."""

    idx: IntArray
    request: EditRequest


class NotSupportedEditRequest(Exception):
    pass
