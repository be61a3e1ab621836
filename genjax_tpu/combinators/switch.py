"""`Switch` combinator: runtime branch selection over N generative
functions.

Capability parity with reference
`_src/generative_functions/combinators/switch.py:52-354`.

TPU note: `multi_switch` evaluates exactly one branch under `lax.switch`
into a zero-padded superstructure; `tree_choose` then selects
retval/score. This is the compiler-friendly realization of existence
uncertainty — no dynamic shapes, no host control flow.
"""

from typing import Any, Generic, TypeVar


from genjax_tpu.core.choice_map import Address, ChoiceMap, Selection
from genjax_tpu.core.concepts import (
    Argdiffs,
    EditRequest,
    NotSupportedEditRequest,
    Retdiff,
    Score,
    Weight,
)
from genjax_tpu.core.diff import Diff, NoChange, UnknownChange
from genjax_tpu.core.gfi import GenerativeFunction, Trace, Update
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.staging import multi_switch, tree_choose
from genjax_tpu.core.typing import IntArray, PRNGKey

R = TypeVar("R")


@Pytree.dataclass
class SwitchTrace(Generic[R], Trace[R]):
    gen_fn: "Switch[R]"
    args: tuple
    subtraces: list
    retval: R
    score: Any

    def get_idx(self) -> IntArray:
        return self.get_args()[0]

    def get_args(self) -> tuple:
        return self.args

    def get_choices(self) -> ChoiceMap:
        sub_chms = (tr.get_choices() for tr in self.subtraces)
        return ChoiceMap.switch(self.get_idx(), sub_chms)

    def get_gen_fn(self):
        return self.gen_fn

    def get_retval(self):
        return self.retval

    def get_score(self):
        return self.score

    def get_inner_trace(self, address: Address):
        return self.subtraces[self.get_idx()].get_inner_trace(address)


@Pytree.dataclass
class Switch(Generic[R], GenerativeFunction[R]):
    """Takes `n` branches; the resulting gen fn takes `(idx, args_0, ...,
    args_{n-1})` and executes branch `idx` (clamped into range) with its
    argument tuple. Branches may trace different addresses (existence
    uncertainty)."""

    branches: tuple

    def __abstract_call__(self, *args) -> R:
        idx, branch_args = args[0], args[1:]
        retvals = [
            f.__abstract_call__(*f_args)
            for f, f_args in zip(self.branches, branch_args)
        ]
        return tree_choose(idx, retvals)

    def _check_args(self, args):
        assert len(args) == len(self.branches)

    def simulate(self, key: PRNGKey, args: tuple) -> SwitchTrace[R]:
        idx, branch_args = args[0], args[1:]
        self._check_args(branch_args)
        fs = [f.simulate for f in self.branches]
        f_args = [(key, a) for a in branch_args]
        subtraces = multi_switch(idx, fs, f_args)
        retval, score = tree_choose(
            idx, [(tr.get_retval(), tr.get_score()) for tr in subtraces]
        )
        return SwitchTrace(self, args, subtraces, retval, score)

    def assess(self, sample: ChoiceMap, args: tuple) -> tuple[Score, R]:
        idx, branch_args = args[0], args[1:]
        self._check_args(branch_args)
        fs = [f.assess for f in self.branches]
        f_args = [(sample, a) for a in branch_args]
        return tree_choose(idx, multi_switch(idx, fs, f_args))

    def generate(
        self, key: PRNGKey, constraint: ChoiceMap, args: tuple
    ) -> tuple[SwitchTrace[R], Weight]:
        idx, branch_args = args[0], args[1:]
        self._check_args(branch_args)
        fs = [f.generate for f in self.branches]
        f_args = [(key, constraint, a) for a in branch_args]
        pairs = multi_switch(idx, fs, f_args)
        subtraces = [tr for tr, _ in pairs]
        retval, score, weight = tree_choose(
            idx, [(tr.get_retval(), tr.get_score(), w) for tr, w in pairs]
        )
        return SwitchTrace(self, args, subtraces, retval, score), weight

    def project(self, key: PRNGKey, trace: Trace[R], selection: Selection) -> Weight:
        assert isinstance(trace, SwitchTrace)
        idx = trace.get_idx()
        fs = [f.project for f in self.branches]
        f_args = [(key, tr, selection) for tr in trace.subtraces]
        return tree_choose(idx, multi_switch(idx, fs, f_args))

    def _edit_fresh_trace(self, gen_fn: GenerativeFunction[R]):
        """When the branch index changed, the new branch has no prior
        subtrace: simulate a fresh one and edit it in place."""

        def inner(key, edit_request, argdiffs):
            primals = Diff.tree_primal(argdiffs)
            new_trace = gen_fn.simulate(key, primals)
            tr, w, rd, bwd = gen_fn.edit(
                key, new_trace, edit_request, Diff.no_change(primals)
            )
            return tr, w, Diff.unknown_change(rd), bwd

        return inner

    def edit(
        self,
        key: PRNGKey,
        trace: Trace[R],
        edit_request: EditRequest,
        argdiffs: Argdiffs,
    ) -> tuple[SwitchTrace[R], Weight, Retdiff, EditRequest]:
        from genjax_tpu.core.requests import Regenerate

        if not isinstance(edit_request, (Update, Regenerate)):
            raise NotSupportedEditRequest(edit_request)
        assert isinstance(trace, SwitchTrace)
        idx_diff, branch_argdiffs = argdiffs[0], argdiffs[1:]
        self._check_args(branch_argdiffs)
        primals = Diff.tree_primal(argdiffs)
        new_idx = primals[0]

        if Diff.tree_tangent(idx_diff) is NoChange:
            fs = [f.edit for f in self.branches]
            f_args = [
                (key, tr, edit_request, ad)
                for tr, ad in zip(trace.subtraces, branch_argdiffs)
            ]
        else:
            fs = [self._edit_fresh_trace(f) for f in self.branches]
            f_args = [(key, edit_request, ad) for ad in branch_argdiffs]

        rets = multi_switch(new_idx, fs, f_args)
        subtraces = [t[0] for t in rets]
        score, weight, retval = tree_choose(
            new_idx,
            [(tr.get_score(), w, Diff.tree_primal(rd)) for tr, w, rd, _ in rets],
        )
        if Diff.tree_tangent(idx_diff) is UnknownChange:
            # Index move: the weight is the full joint delta (same
            # convention as Mask's existence transitions and Regenerate).
            # The fresh-branch inner edit's weight (edited - fresh) must
            # be DISCARDED, not added — keeping it double-counts every
            # constrained site (caught by
            # tests/combinators/test_combinator_properties.py).
            weight = score - trace.get_score()
            # The reverse of an index move re-constrains the old branch's
            # choices wholesale (applied together with argdiffs restoring
            # the old index).
            bwd_request = Update(trace.get_choices())
        else:
            # Same-branch edit: pick the executed branch's backward
            # request. `tree_choose` requires the branch requests to share
            # one tree structure; heterogeneous branches get an explicit
            # unsupported sentinel instead of branch 0's (wrong) request.
            import jax.tree_util as jtu

            from genjax_tpu.core.requests import UnsupportedBackwardRequest

            bwds = [t[3] for t in rets]
            structures = {jtu.tree_structure(b) for b in bwds}
            if len(structures) == 1:
                bwd_request = tree_choose(new_idx, bwds)
            else:
                bwd_request = UnsupportedBackwardRequest(
                    "Switch branches produced structurally different "
                    "backward requests; reverse this move by re-simulating "
                    "or constraining the old choices explicitly."
                )
        return (
            SwitchTrace(self, primals, subtraces, retval, score),
            weight,
            Diff.unknown_change(retval),
            bwd_request,
        )


def switch(*gen_fns: GenerativeFunction[R]) -> Switch[R]:
    """Build a `Switch` over the given branches."""
    return Switch(tuple(gen_fns))
