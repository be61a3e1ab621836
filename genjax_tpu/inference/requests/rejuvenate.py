"""`Rejuvenate`: MH-with-custom-proposal as an SMCP3 edit request.

Capability parity with reference
`_src/inference/requests/rejuvenate.py:45-94`: the returned weight is the
MH acceptance ratio (accept/reject itself is user- or driver-side, e.g.
`genjax_tpu.inference.mcmc.mh`).
"""

from typing import Any, Callable, TypeVar

import jax.random as jrand

from genjax_tpu.core.choice_map import ChoiceMap
from genjax_tpu.core.concepts import Argdiffs, EditRequest, Retdiff, Weight
from genjax_tpu.core.gfi import GenerativeFunction, Trace, Update
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import PRNGKey

R = TypeVar("R")


@Pytree.dataclass(match_args=True)
class Rejuvenate(EditRequest):
    """Propose a change to a trace with a proposal generative function.

    `argument_mapping` maps the previous trace's choices to the proposal's
    arguments; the same proposal serves as both the K and L kernels of the
    SMCP3 move, so the returned weight is exactly the MH accept ratio.
    """

    proposal: GenerativeFunction[Any]
    argument_mapping: Callable[[ChoiceMap], Any] = Pytree.static()

    def edit(
        self, key: PRNGKey, tr: Trace[Any], argdiffs: Argdiffs
    ) -> tuple[Trace[Any], Weight, Retdiff, EditRequest]:
        chm = tr.get_choices()
        fwd_args = self.argument_mapping(chm)
        key, sub_key = jrand.split(key)
        proposed, fwd_score, _ = self.proposal.propose(sub_key, fwd_args)
        new_tr, w, retdiff, bwd_request = Update(proposed).edit(key, tr, argdiffs)
        assert isinstance(bwd_request, Update)
        bwd_chm = bwd_request.constraint
        # Backward kernel density: the probability the proposal, *run from
        # the new trace*, would produce the discarded (old) values. (The
        # reference assesses with arguments derived from the discard
        # itself, `rejuvenate.py:45-94`, which mis-weights asymmetric
        # proposals; deriving arguments from the new choices is the
        # correct L-kernel and makes the weight the exact MH ratio.)
        bwd_args = self.argument_mapping(new_tr.get_choices())
        bwd_score, _ = self.proposal.assess(bwd_chm, bwd_args)
        final_weight = w + bwd_score - fwd_score
        return (
            new_tr,
            final_weight,
            retdiff,
            Rejuvenate(self.proposal, self.argument_mapping),
        )
