"""Core edit requests: `EmptyRequest`, `Regenerate`, `DiffAnnotate`.

Capability parity with reference `_src/core/generative/requests.py:49-95`.
"""

from typing import Any, Generic, TypeVar

import jax.numpy as jnp

from genjax_tpu.core.choice_map import ChoiceMap, Selection
from genjax_tpu.core.concepts import (
    Argdiffs,
    EditRequest,
    PrimitiveEditRequest,
    Retdiff,
    Weight,
)
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.gfi import Trace, Update
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import PRNGKey

R = TypeVar("R")
ER = TypeVar("ER", bound=EditRequest)


@Pytree.dataclass(match_args=True)
class EmptyRequest(EditRequest):
    """No-op request — degenerates to `Update(empty)` if arguments changed."""

    def edit(
        self, key: PRNGKey, tr: Trace[R], argdiffs: Argdiffs
    ) -> tuple[Trace[R], Weight, Retdiff, EditRequest]:
        if Diff.static_check_no_change(argdiffs):
            return tr, jnp.array(0.0), Diff.no_change(tr.get_retval()), EmptyRequest()
        request = Update(ChoiceMap.empty())
        return request.edit(key, tr, argdiffs)


@Pytree.dataclass(match_args=True)
class Regenerate(PrimitiveEditRequest):
    """Resample the selected addresses from the internal proposal."""

    selection: Selection


@Pytree.dataclass(match_args=True)
class UnsupportedBackwardRequest(EditRequest):
    """A sentinel backward request for moves whose reverse cannot be
    expressed as a single request (e.g. `Switch` edits whose branches
    produce structurally different discards). The *forward* move and its
    weight are valid; attempting to run this reverse move raises."""

    reason: str = Pytree.static(default="")

    def edit(self, key: PRNGKey, tr, argdiffs: Argdiffs):
        from genjax_tpu.core.concepts import NotSupportedEditRequest

        raise NotSupportedEditRequest(
            f"This edit's backward request is not representable: {self.reason}"
        )


@Pytree.dataclass(match_args=True)
class DiffAnnotate(Generic[ER], EditRequest):
    """Unsafe argdiff/retdiff coercion wrapper around another request."""

    request: ER
    argdiff_fn: Any = Pytree.static(default=lambda v: v)
    retdiff_fn: Any = Pytree.static(default=lambda v: v)

    def edit(
        self, key: PRNGKey, tr: Trace[R], argdiffs: Argdiffs
    ) -> tuple[Trace[R], Weight, Retdiff, EditRequest]:
        new_argdiffs = self.argdiff_fn(argdiffs)
        tr, w, retdiff, bwd_request = self.request.edit(key, tr, new_argdiffs)
        new_retdiff = self.retdiff_fn(retdiff)
        return tr, w, new_retdiff, bwd_request
