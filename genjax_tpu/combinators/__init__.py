"""Generative function combinators."""

from genjax_tpu.combinators.compose import RepeatCombinator, mix, or_else, repeat
from genjax_tpu.combinators.dimap import Dimap, contramap, dimap, map
from genjax_tpu.combinators.mask import MaskCombinator, mask
from genjax_tpu.combinators.scan import (
    Scan,
    VectorRequest,
    accumulate,
    iterate,
    iterate_final,
    masked_iterate,
    masked_iterate_final,
    prepend_initial_acc,
    reduce,
    scan,
)
from genjax_tpu.combinators.switch import Switch, switch
from genjax_tpu.combinators.vmap import Vmap, vmap

# Re-export the vector index request under the reference's name.
from genjax_tpu.core.concepts import IndexRequest

__all__ = [
    "Dimap",
    "IndexRequest",
    "MaskCombinator",
    "RepeatCombinator",
    "Scan",
    "Switch",
    "VectorRequest",
    "Vmap",
    "accumulate",
    "contramap",
    "dimap",
    "iterate",
    "iterate_final",
    "map",
    "mask",
    "masked_iterate",
    "masked_iterate_final",
    "mix",
    "or_else",
    "prepend_initial_acc",
    "reduce",
    "repeat",
    "scan",
    "switch",
    "vmap",
]
