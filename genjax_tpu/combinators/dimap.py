"""`Dimap` combinator: pre/post transformation of arguments and return
values. `map` and `contramap` are the one-sided specializations.

Capability parity with reference
`_src/generative_functions/combinators/dimap.py:55-359`.
"""

from typing import Any, Callable, Generic, TypeVar

from genjax_tpu.core.choice_map import Address, ChoiceMap, Selection
from genjax_tpu.core.concepts import (
    Argdiffs,
    EditRequest,
    Retdiff,
    Score,
    Weight,
)
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.gfi import GenerativeFunction, Trace
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import PRNGKey

ArgTuple = TypeVar("ArgTuple", bound=tuple)
R = TypeVar("R")
S = TypeVar("S")


@Pytree.dataclass
class DimapTrace(Generic[R, S], Trace[S]):
    gen_fn: "Dimap[Any, R, S]"
    inner: Trace[R]
    args: tuple
    retval: S

    def get_args(self) -> tuple:
        return self.args

    def get_gen_fn(self) -> GenerativeFunction[S]:
        return self.gen_fn

    def get_choices(self) -> ChoiceMap:
        return self.inner.get_choices()

    def get_retval(self) -> S:
        return self.retval

    def get_score(self) -> Score:
        return self.inner.get_score()

    def get_inner_trace(self, address: Address) -> Trace[R]:
        return self.inner.get_inner_trace(address)


@Pytree.dataclass
class Dimap(Generic[ArgTuple, R, S], GenerativeFunction[S]):
    """Transform arguments with `argument_mapping` before the inner gen fn
    runs, and the return value with `retval_mapping(args, inner_args,
    inner_retval)` afterward. Choices and scores pass through unchanged."""

    inner: GenerativeFunction[R]
    argument_mapping: Callable[..., ArgTuple] = Pytree.static()
    retval_mapping: Callable[..., S] = Pytree.static()
    info: str | None = Pytree.static(default=None)

    def _map_ret(self, args, inner_args, inner_retval) -> S:
        return self.retval_mapping(args, inner_args, inner_retval)

    def simulate(self, key: PRNGKey, args: tuple) -> DimapTrace[R, S]:
        inner_args = self.argument_mapping(*args)
        tr = self.inner.simulate(key, inner_args)
        retval = self._map_ret(args, inner_args, tr.get_retval())
        return DimapTrace(self, tr, args, retval)

    def generate(
        self, key: PRNGKey, constraint: ChoiceMap, args: tuple
    ) -> tuple[DimapTrace[R, S], Weight]:
        inner_args = self.argument_mapping(*args)
        tr, weight = self.inner.generate(key, constraint, inner_args)
        retval = self._map_ret(args, inner_args, tr.get_retval())
        return DimapTrace(self, tr, args, retval), weight

    def assess(self, sample: ChoiceMap, args: tuple) -> tuple[Score, S]:
        inner_args = self.argument_mapping(*args)
        score, inner_retval = self.inner.assess(sample, inner_args)
        return score, self._map_ret(args, inner_args, inner_retval)

    def project(self, key: PRNGKey, trace: Trace[S], selection: Selection) -> Weight:
        assert isinstance(trace, DimapTrace)
        return trace.inner.project(key, selection)

    def edit(
        self,
        key: PRNGKey,
        trace: Trace[S],
        edit_request: EditRequest,
        argdiffs: Argdiffs,
    ) -> tuple[DimapTrace[R, S], Weight, Retdiff, EditRequest]:
        assert isinstance(trace, DimapTrace)
        primals = Diff.tree_primal(argdiffs)
        inner_args = self.argument_mapping(*primals)
        inner_argdiffs = (
            Diff.no_change(inner_args)
            if Diff.static_check_no_change(argdiffs)
            else Diff.unknown_change(inner_args)
        )
        tr, w, inner_retdiff, bwd = self.inner.edit(
            key, trace.inner, edit_request, inner_argdiffs
        )
        inner_retval = Diff.tree_primal(inner_retdiff)
        retval = self._map_ret(primals, inner_args, inner_retval)
        retdiff = (
            Diff.no_change(retval)
            if Diff.static_check_no_change(inner_retdiff)
            else Diff.unknown_change(retval)
        )
        return (
            DimapTrace(self, tr, primals, retval),
            w,
            retdiff,
            bwd,
        )

    def __abstract_call__(self, *args):
        inner_args = self.argument_mapping(*args)
        inner_ret = self.inner.__abstract_call__(*inner_args)
        return self._map_ret(args, inner_args, inner_ret)


def dimap(
    *,
    pre: Callable[..., Any] = lambda *args: args,
    post: Callable[..., Any] = lambda args, xformed, retval: retval,
    info: str | None = None,
):
    """Decorator: transform both arguments and return values."""

    def decorator(f: GenerativeFunction[R]) -> Dimap[Any, R, Any]:
        return Dimap(f, pre, post, info)

    return decorator


def map(f: Callable[..., Any], *, info: str | None = None):
    """Decorator: transform the return value only."""

    def decorator(gen_fn: GenerativeFunction[R]):
        return Dimap(
            gen_fn,
            lambda *args: args,
            lambda _args, _xformed, ret: f(ret),
            info or "map",
        )

    return decorator


def contramap(f: Callable[..., Any], *, info: str | None = None):
    """Decorator: transform the arguments only."""

    def decorator(gen_fn: GenerativeFunction[R]):
        return Dimap(
            gen_fn,
            f,
            lambda _args, _xformed, ret: ret,
            info or "contramap",
        )

    return decorator
