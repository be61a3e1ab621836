"""Composed combinators: `mix`, `or_else`, `repeat`.

Capability parity with reference
`_src/generative_functions/combinators/{mixture,or_else,repeat}.py`.
"""

from typing import TypeVar

import jax.numpy as jnp

from genjax_tpu.core.gfi import GenerativeFunction
from genjax_tpu.core.typing import ScalarFlag

R = TypeVar("R")


def mix(*gen_fns: GenerativeFunction[R]) -> GenerativeFunction[R]:
    """Mixture model over component generative functions.

    The result takes `(mixture_logits, args_0, ..., args_{n-1})`, samples
    a component index at `"mixture_component"` via a categorical over the
    logits, and the component's value at `"component_sample"`.
    """
    from genjax_tpu.combinators.switch import switch
    from genjax_tpu.distributions import categorical
    from genjax_tpu.lang.static import gen

    branch_switch = switch(*gen_fns)

    def mixture_model(logits, *args):
        component = categorical(logits=logits) @ "mixture_component"
        v = branch_switch(component, *args) @ "component_sample"
        return v

    return gen(mixture_model)


def or_else(
    if_gen_fn: GenerativeFunction[R],
    else_gen_fn: GenerativeFunction[R],
) -> GenerativeFunction[R]:
    """Boolean-gated branch: `(flag, if_args, else_args)` runs `if_gen_fn`
    when the flag is true, `else_gen_fn` otherwise (switch + contramap)."""

    def argument_mapping(flag: ScalarFlag, if_args: tuple, else_args: tuple):
        # branch 0 = if, branch 1 = else
        branch = jnp.where(flag, 0, 1)
        return (branch, if_args, else_args)

    return if_gen_fn.switch(else_gen_fn).contramap(argument_mapping)


def RepeatCombinator(gen_fn: GenerativeFunction[R], /, *, n: int):
    """`a -> b` becomes `a -> [b]` via vmap over a dummy index axis."""
    dropped = gen_fn.contramap(lambda _idx, args: args)
    return dropped.vmap(in_axes=(0, None)).contramap(
        lambda *args: (jnp.zeros(n), args)
    )


def repeat(*, n: int):
    """Decorator form of `RepeatCombinator`."""

    def decorator(gen_fn: GenerativeFunction[R]) -> GenerativeFunction[R]:
        return RepeatCombinator(gen_fn, n=n)

    return decorator
