"""Core layer: pytree base, staging utilities, generative data types, GFI."""

from genjax_tpu.core.checked import checked_mode, do_checked
from genjax_tpu.core.typecheck import do_typecheck, is_typechecked
from genjax_tpu.core.checkify import do_checkify, optional_check
from genjax_tpu.core.choice_map import (
    Address,
    AddressComponent,
    ChoiceMap,
    ChoiceMapBuilder,
    Selection,
    SelectionBuilder,
    StaticAddress,
    StaticAddressComponent,
)
from genjax_tpu.core.concepts import (
    Argdiffs,
    Arguments,
    EditRequest,
    IndexRequest,
    NotSupportedEditRequest,
    PrimitiveEditRequest,
    Retdiff,
    Score,
    Weight,
)
from genjax_tpu.core.diff import ChangeTangent, Diff, NoChange, UnknownChange, incremental
from genjax_tpu.core.environment import Environment
from genjax_tpu.core.gfi import (
    GenerativeFunction,
    GenerativeFunctionClosure,
    IgnoreKwargs,
    Trace,
    Update,
)
from genjax_tpu.core.mask import Mask
from genjax_tpu.core.pytree import Closure, Const, Pytree, PythonicPytree, nth
from genjax_tpu.core.primitives import InitialStylePrimitive, initial_style_bind
from genjax_tpu.core.requests import DiffAnnotate, EmptyRequest, Regenerate
from genjax_tpu.core.staging import (
    FlagOp,
    empty_trace,
    get_shaped_aval,
    multi_switch,
    stage,
    to_shape_fn,
    tree_choose,
)
from genjax_tpu.core.typing import R

__all__ = [
    "Address",
    "AddressComponent",
    "R",
    "Argdiffs",
    "Arguments",
    "ChoiceMap",
    "ChoiceMapBuilder",
    "Closure",
    "Const",
    "ChangeTangent",
    "Diff",
    "Environment",
    "DiffAnnotate",
    "EditRequest",
    "EmptyRequest",
    "FlagOp",
    "GenerativeFunction",
    "GenerativeFunctionClosure",
    "IgnoreKwargs",
    "InitialStylePrimitive",
    "initial_style_bind",
    "get_shaped_aval",
    "IndexRequest",
    "Mask",
    "NoChange",
    "NotSupportedEditRequest",
    "PrimitiveEditRequest",
    "Pytree",
    "PythonicPytree",
    "Regenerate",
    "Retdiff",
    "Score",
    "Selection",
    "SelectionBuilder",
    "StaticAddress",
    "StaticAddressComponent",
    "Trace",
    "UnknownChange",
    "Update",
    "Weight",
    "checked_mode",
    "do_checked",
    "do_checkify",
    "do_typecheck",
    "empty_trace",
    "incremental",
    "is_typechecked",
    "multi_switch",
    "nth",
    "optional_check",
    "stage",
    "to_shape_fn",
    "tree_choose",
]
