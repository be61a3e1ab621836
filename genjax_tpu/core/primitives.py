"""Initial-style JAX primitives: custom primitives whose implementation is
a staged jaxpr carried in the bind parameters.

Capability parity with reference
`_src/core/compiler/initial_style_primitive.py:31-94`. Used only by the
ADEV transform (`genjax_tpu.adev`), which needs sample points visible as
jaxpr equations; the GFI paths never touch this machinery.
"""

from typing import Any, Callable

import jax
import jax.tree_util as jtu
from jax.extend.core import Primitive
from jax.interpreters import batching, mlir

from genjax_tpu.core.staging import stage


class InitialStylePrimitive(Primitive):
    """A primitive that evaluates the staged jaxpr carried in its params —
    correct under plain evaluation, jit, and custom interpreters."""

    def __init__(self, name: str):
        super().__init__(name)
        self.multiple_results = True

        def impl(*flat_args, **params):
            jaxpr = params["jaxpr"]
            num_consts = params["num_consts"]
            consts, args = flat_args[:num_consts], flat_args[num_consts:]
            return jax.core.eval_jaxpr(jaxpr, consts, *args)

        self.def_impl(impl)

        def abstract(*flat_avals, **params):
            return params["out_avals"]

        self.def_abstract_eval(abstract)
        mlir.register_lowering(self, mlir.lower_fun(impl, multiple_results=True))

        def batch(args, dims, **params):
            raise NotImplementedError(
                f"Batching for initial-style primitive {name} is handled by "
                "the enclosing transform (see ADEVPrimitive.get_batched_prim)."
            )

        batching.primitive_batchers[self] = batch


def initial_style_bind(prim: InitialStylePrimitive, **extra_params):
    """`initial_style_bind(prim)(fn)(*args)` stages `fn`, binds `prim` with
    the flat arguments, and unflattens the results."""

    def bind(fn: Callable[..., Any]):
        def wrapped(*args):
            closed_jaxpr, (flat_args, in_tree, out_tree_thunk) = stage(fn)(*args)
            out_tree = out_tree_thunk()
            out_avals = tuple(v.aval for v in closed_jaxpr.jaxpr.outvars)
            consts = closed_jaxpr.literals
            outs = prim.bind(
                *consts,
                *flat_args,
                jaxpr=closed_jaxpr.jaxpr,
                in_tree=in_tree,
                out_tree=out_tree,
                out_avals=out_avals,
                num_consts=len(consts),
                **extra_params,
            )
            return jtu.tree_unflatten(out_tree, outs)

        return wrapped

    return bind
