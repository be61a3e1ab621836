"""`Trace` and `GenerativeFunction`: the generative function interface (GFI).

Capability parity with reference
`_src/core/generative/generative_function.py:72-1689`:

* `Trace`: `get_args/get_retval/get_score/get_choices/get_gen_fn`,
  `edit/update/project/get_subtrace/get_inner_trace`.
* `GenerativeFunction`: abstract `simulate/assess/generate/project/edit`,
  derived `update/importance/propose`, `get_zero_trace`, kwargs handling,
  `__call__` returning an addressable closure (`gf(args) @ "addr"`), and
  the full postfix combinator family (`vmap/repeat/scan/accumulate/reduce/
  iterate/iterate_final/masked_iterate(_final)/mask/or_else/switch/mix/
  dimap/map/contramap/marginal`).
* `Update` edit request.

Weight/score math follows the Gen/SMCP3 specification documented in the
reference docstrings (`generative_function.py:93-135, 496-604`).
"""

import functools
from typing import Any, Generic, TypeVar

from genjax_tpu.core.choice_map import Address, ChoiceMap, Selection
from genjax_tpu.core.concepts import (
    Argdiffs,
    Arguments,
    EditRequest,
    PrimitiveEditRequest,
    Retdiff,
    Score,
    Weight,
)
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.staging import empty_trace
from genjax_tpu.core.typing import InAxes, PRNGKey

R = TypeVar("R")
S = TypeVar("S")
Carry = TypeVar("Carry")
Y = TypeVar("Y")


#########
# Trace #
#########


class Trace(Generic[R], Pytree):
    """An execution record of a generative function: arguments, return
    value, addressed random choices, and the score (log density of the
    sample under the function's distribution over samples)."""

    def get_args(self) -> Arguments:
        raise NotImplementedError

    def get_retval(self) -> R:
        raise NotImplementedError

    def get_score(self) -> Score:
        raise NotImplementedError

    def get_choices(self) -> ChoiceMap:
        raise NotImplementedError

    def get_sample(self) -> ChoiceMap:
        return self.get_choices()

    def get_gen_fn(self) -> "GenerativeFunction[R]":
        raise NotImplementedError

    def edit(
        self,
        key: PRNGKey,
        request: EditRequest,
        argdiffs: tuple | None = None,
    ) -> tuple["Trace[R]", Weight, Retdiff, EditRequest]:
        return request.edit(
            key,
            self,
            Diff.no_change(self.get_args()) if argdiffs is None else argdiffs,
        )

    def update(
        self,
        key: PRNGKey,
        constraint: ChoiceMap,
        argdiffs: tuple | None = None,
    ) -> tuple["Trace[R]", Weight, Retdiff, ChoiceMap]:
        return self.get_gen_fn().update(
            key,
            self,
            constraint,
            Diff.no_change(self.get_args()) if argdiffs is None else argdiffs,
        )

    def project(self, key: PRNGKey, selection: Selection) -> Weight:
        return self.get_gen_fn().project(key, self, selection)

    def get_subtrace(self, *addresses: Address) -> "Trace[Any]":
        return functools.reduce(
            lambda tr, addr: tr.get_inner_trace(addr), addresses, self
        )

    def get_inner_trace(self, _address: Address) -> "Trace[Any]":
        raise NotImplementedError(
            "This type of Trace object does not possess subtraces."
        )

    @property
    def batch_shape(self):
        return len(self.get_score())


#######################
# Generative function #
#######################


class GenerativeFunction(Generic[R], Pytree):
    """The type of generative functions: probabilistic programs exposing
    `simulate`, `assess`, `generate`, `project`, and `edit` (the GFI).

    `retval_is_value` is a static dataflow promise consumed by the
    incremental-edit analysis (`lang/analysis.py`): True means the return
    value IS the (single) sampled value, so it cannot change unless the
    site itself is edited. Distributions set it; composite generative
    functions (whose retval may deterministically read their arguments)
    must leave it False.

    Example — the full interface on a two-site model:

    >>> import jax, jax.numpy as jnp
    >>> import genjax_tpu as gx
    >>> @gx.gen
    ... def model(shift):
    ...     x = gx.normal(shift, 1.0) @ "x"
    ...     y = gx.normal(x, 1.0) @ "y"
    ...     return y
    >>> tr = model.simulate(jax.random.key(0), (0.0,))
    >>> score, _ = model.assess(tr.get_choices(), (0.0,))
    >>> bool(jnp.isclose(score, tr.get_score()))
    True
    >>> tr2, w = model.importance(jax.random.key(1), gx.ChoiceMap.kw(y=1.0), (0.0,))
    >>> bool(jnp.isfinite(w))
    True
    """

    # Not a dataclass field (unannotated on purpose): a static class-level
    # promise, never traced state.
    retval_is_value = False

    def __call__(self, *args, **kwargs) -> "GenerativeFunctionClosure[R]":
        return GenerativeFunctionClosure(self, args, kwargs)

    def __abstract_call__(self, *args) -> R:
        """Zero-FLOP abstract execution for shape inference."""
        return self.get_zero_trace(*args).get_retval()

    def handle_kwargs(self) -> "GenerativeFunction[R]":
        return IgnoreKwargs(self)

    def get_zero_trace(self, *args, **_kwargs) -> Trace[R]:
        return empty_trace(self, args)

    # -- abstract GFI ----------------------------------------------------------

    def simulate(self, key: PRNGKey, args: Arguments) -> Trace[R]:
        """Sample from the distribution over samples and return a trace.

        >>> import jax
        >>> import genjax_tpu as gx
        >>> tr = gx.normal.simulate(jax.random.key(0), (0.0, 1.0))
        >>> bool(tr.get_score() < 0)  # a log density
        True
        """
        raise NotImplementedError

    def assess(self, sample: ChoiceMap, args: Arguments) -> tuple[Score, R]:
        """Evaluate the log density of a fully-constraining sample.

        >>> import jax.numpy as jnp
        >>> import genjax_tpu as gx
        >>> score, retval = gx.normal.assess(gx.ChoiceMap.choice(0.0), (0.0, 1.0))
        >>> print(round(float(score), 4))  # log N(0; 0, 1)
        -0.9189
        """
        raise NotImplementedError

    def generate(
        self, key: PRNGKey, constraint: ChoiceMap, args: Arguments
    ) -> tuple[Trace[R], Weight]:
        """Importance-sample a trace consistent with `constraint`; the weight
        is `log P(t)/Q(t; constraint)` (internal-proposal importance weight).

        >>> import jax, jax.numpy as jnp
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def m():
        ...     x = gx.normal(0.0, 1.0) @ "x"
        ...     _ = gx.normal(x, 1.0) @ "y"
        >>> tr, w = m.generate(jax.random.key(0), gx.ChoiceMap.kw(y=0.5), ())
        >>> float(tr.get_choices()["y"])  # constrained exactly
        0.5
        >>> bool(jnp.isfinite(w))  # w = log N(y=0.5; x, 1)
        True
        """
        raise NotImplementedError

    def project(
        self, key: PRNGKey, trace: Trace[R], selection: Selection
    ) -> Weight:
        raise NotImplementedError

    def edit(
        self,
        key: PRNGKey,
        trace: Trace[R],
        edit_request: EditRequest,
        argdiffs: Argdiffs,
    ) -> tuple[Trace[R], Weight, Retdiff, EditRequest]:
        """Respond to an SMCP3 edit request: returns the new trace, the
        incremental weight, the retdiff, and the backward request."""
        raise NotImplementedError

    # -- derived interfaces ------------------------------------------------------

    def update(
        self,
        key: PRNGKey,
        trace: Trace[R],
        constraint: ChoiceMap,
        argdiffs: Argdiffs,
    ) -> tuple[Trace[R], Weight, Retdiff, ChoiceMap]:
        """Constrain addresses in `constraint` and reweight: returns
        `(new_trace, weight, retdiff, discarded_choices)` with
        `weight = new_score - old_score` when args are unchanged and every
        touched address is constrained.

        >>> import jax, jax.numpy as jnp
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def m():
        ...     x = gx.normal(0.0, 1.0) @ "x"
        ...     return x
        >>> tr = m.simulate(jax.random.key(0), ())
        >>> new_tr, w, _, discard = m.update(
        ...     jax.random.key(1), tr, gx.ChoiceMap.kw(x=0.0), gx.Diff.no_change(())
        ... )
        >>> bool(jnp.isclose(w, new_tr.get_score() - tr.get_score()))
        True
        >>> bool(jnp.isclose(discard["x"], tr.get_choices()["x"]))
        True
        """
        request = Update(constraint)
        tr, w, rd, bwd = request.edit(key, trace, argdiffs)
        assert isinstance(bwd, Update), type(bwd)
        return tr, w, rd, bwd.constraint

    def importance(
        self, key: PRNGKey, constraint: ChoiceMap, args: Arguments
    ) -> tuple[Trace[R], Weight]:
        """Alias for `generate` (Gen's traditional name)."""
        return self.generate(key, constraint, args)

    def propose(
        self, key: PRNGKey, args: Arguments
    ) -> tuple[ChoiceMap, Score, R]:
        """Sample and return `(choices, score, retval)` — the shape needed
        to use this function as a proposal distribution.

        >>> import jax
        >>> import genjax_tpu as gx
        >>> chm, score, v = gx.normal.propose(jax.random.key(0), (0.0, 1.0))
        >>> bool(chm.get_value() == v)
        True
        """
        tr = self.simulate(key, args)
        return tr.get_choices(), tr.get_score(), tr.get_retval()

    # -- postfix combinators -------------------------------------------------------

    def vmap(self, /, *, in_axes: InAxes = 0) -> "GenerativeFunction[R]":
        """Vectorize over a leading batch axis; lane `i`'s choices nest
        under integer address `i`.

        >>> import jax, jax.numpy as jnp
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def cell(mu):
        ...     return gx.normal(mu, 1.0) @ "z"
        >>> batched = cell.vmap(in_axes=(0,))
        >>> tr = batched.simulate(jax.random.key(0), (jnp.zeros(5),))
        >>> tr.get_choices()[..., "z"].shape
        (5,)
        """
        import genjax_tpu.combinators as cmb

        return cmb.vmap(in_axes=in_axes)(self)

    def repeat(self, /, *, n: int) -> "GenerativeFunction[R]":
        """Run `n` iid copies (vmap over a dummy axis).

        >>> import jax
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def coin():
        ...     return gx.flip(0.5) @ "b"
        >>> tr = coin.repeat(n=4).simulate(jax.random.key(0), ())
        >>> tr.get_retval().shape
        (4,)
        """
        import genjax_tpu.combinators as cmb

        return cmb.repeat(n=n)(self)

    def scan(self, /, *, n: int | None = None) -> "GenerativeFunction[Any]":
        """Turn a `(carry, x) -> (carry, y)` kernel into a sequential
        model over `lax.scan`; step `t`'s choices nest under address `t`.

        >>> import jax
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def step(z, _x):
        ...     z = gx.normal(0.9 * z, 0.5) @ "z"
        ...     return (z, z)
        >>> ssm = step.scan(n=10)
        >>> tr = ssm.simulate(jax.random.key(0), (0.0, None))
        >>> carry, ys = tr.get_retval()
        >>> ys.shape
        (10,)
        """
        import genjax_tpu.combinators as cmb

        return cmb.scan(n=n)(self)

    def accumulate(self) -> "GenerativeFunction[Any]":
        """`(carry, x) -> carry` kernel to `(carry, [x]) -> [carry]`
        (all intermediate accumulations, initial value prepended)."""
        import genjax_tpu.combinators as cmb

        return cmb.accumulate()(self)

    def reduce(self) -> "GenerativeFunction[Any]":
        """`(carry, x) -> carry` kernel to `(carry, [x]) -> carry`
        (final accumulation only)."""
        import genjax_tpu.combinators as cmb

        return cmb.reduce()(self)

    def iterate(self, /, *, n: int) -> "GenerativeFunction[Any]":
        """`a -> a` kernel applied `n` times; returns all `n+1` iterates.

        >>> import jax
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def walk(z):
        ...     return gx.normal(z, 1.0) @ "z"
        >>> tr = walk.iterate(n=3).simulate(jax.random.key(0), (0.0,))
        >>> tr.get_retval().shape
        (4,)
        """
        import genjax_tpu.combinators as cmb

        return cmb.iterate(n=n)(self)

    def iterate_final(self, /, *, n: int) -> "GenerativeFunction[Any]":
        """`a -> a` kernel applied `n` times; returns the final value."""
        import genjax_tpu.combinators as cmb

        return cmb.iterate_final(n=n)(self)

    def masked_iterate(self) -> "GenerativeFunction[Any]":
        """Variable-length `iterate`: per-step Boolean flags gate each
        step's score (masked-out steps contribute zero)."""
        import genjax_tpu.combinators as cmb

        return cmb.masked_iterate()(self)

    def masked_iterate_final(self) -> "GenerativeFunction[Any]":
        """Variable-length `iterate_final` (see `masked_iterate`)."""
        import genjax_tpu.combinators as cmb

        return cmb.masked_iterate_final()(self)

    def mask(self) -> "GenerativeFunction[Any]":
        """Prepend a Boolean argument gating existence: when False the
        score is 0 and the retval is a `Mask` with flag False.

        >>> import jax, jax.numpy as jnp
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def m():
        ...     return gx.normal(0.0, 1.0) @ "x"
        >>> tr = m.mask().simulate(jax.random.key(0), (jnp.asarray(False),))
        >>> float(tr.get_score())
        0.0
        """
        import genjax_tpu.combinators as cmb

        return cmb.mask(self)

    def or_else(self, gen_fn: "GenerativeFunction[Any]") -> "GenerativeFunction[Any]":
        """Boolean branch: `(flag, self_args, else_args)` runs `self` when
        the flag is true, `gen_fn` otherwise."""
        import genjax_tpu.combinators as cmb

        return cmb.or_else(self, gen_fn)

    def switch(self, *branches: "GenerativeFunction[Any]") -> "GenerativeFunction[Any]":
        """Runtime branch selection: `(idx, args_0, ..., args_n)` executes
        branch `idx` (this function is branch 0).

        >>> import jax, jax.numpy as jnp
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def lo():
        ...     return gx.normal(-10.0, 0.1) @ "v"
        >>> @gx.gen
        ... def hi():
        ...     return gx.normal(10.0, 0.1) @ "v"
        >>> sw = lo.switch(hi)
        >>> tr = sw.simulate(jax.random.key(0), (jnp.asarray(1), (), ()))
        >>> bool(tr.get_retval() > 0)
        True
        """
        import genjax_tpu.combinators as cmb

        return cmb.switch(self, *branches)

    def mix(self, *fns: "GenerativeFunction[Any]") -> "GenerativeFunction[Any]":
        """Mixture: first argument is component logits; traces
        `"mixture_component"` and `"component_sample"`."""
        import genjax_tpu.combinators as cmb

        return cmb.mix(self, *fns)

    def dimap(self, /, *, pre=lambda *args: args, post=lambda args, xformed, retval: retval, info=None):
        """Transform arguments (`pre`) and return value (`post`) around
        this function; diffs propagate through both under `edit`."""
        import genjax_tpu.combinators as cmb

        return cmb.dimap(pre=pre, post=post, info=info)(self)

    def map(self, f, *, info=None):
        """Post-compose `f` onto the return value.

        >>> import jax
        >>> import genjax_tpu as gx
        >>> @gx.gen
        ... def m():
        ...     return gx.normal(0.0, 1.0) @ "x"
        >>> doubled = m.map(lambda v: 2.0 * v)
        >>> tr = doubled.simulate(jax.random.key(0), ())
        >>> bool(tr.get_retval() == 2.0 * tr.get_choices()["x"])
        True
        """
        import genjax_tpu.combinators as cmb

        return cmb.map(f, info=info)(self)

    def contramap(self, f, *, info=None):
        """Pre-compose `f` onto the arguments."""
        import genjax_tpu.combinators as cmb

        return cmb.contramap(f, info=info)(self)

    def marginal(self, /, *, selection: Selection | None = None, algorithm=None):
        """Marginalize to a distribution over the selected addresses
        (density estimated with `algorithm`, default 1-particle
        importance)."""
        from genjax_tpu.inference.sp import marginal

        selection = Selection.all() if selection is None else selection
        return marginal(selection=selection, algorithm=algorithm)(self)


##########################################
# Kwargs support / addressable closures  #
##########################################


@Pytree.dataclass
class IgnoreKwargs(GenerativeFunction[R]):
    """Adapter: GFI methods take `((args...), {kwargs...})` argument tuples
    (reference `generative_function.py:1488-1554`)."""

    wrapped: GenerativeFunction[R]

    def handle_kwargs(self) -> GenerativeFunction[R]:
        raise NotImplementedError

    def __abstract_call__(self, *args):
        (args_tuple, kwargs) = args
        return self.wrapped.__abstract_call__(*args_tuple)

    def simulate(self, key: PRNGKey, args: Arguments):
        (args_tuple, _kwargs) = args
        return self.wrapped.simulate(key, args_tuple)

    def assess(self, sample: ChoiceMap, args: Arguments):
        (args_tuple, _kwargs) = args
        return self.wrapped.assess(sample, args_tuple)

    def generate(self, key: PRNGKey, constraint: ChoiceMap, args: Arguments):
        (args_tuple, _kwargs) = args
        return self.wrapped.generate(key, constraint, args_tuple)

    def project(self, key: PRNGKey, trace: Trace[R], selection: Selection):
        return self.wrapped.project(key, trace, selection)

    def edit(self, key, trace, edit_request, argdiffs):
        (argdiffs_tuple, _kwargs) = argdiffs
        return self.wrapped.edit(key, trace, edit_request, argdiffs_tuple)


@Pytree.dataclass
class GenerativeFunctionClosure(Generic[R], Pytree):
    """The value of `gen_fn(*args)`: addressable via `@ "addr"` inside a
    generative program; also callable as an ordinary sampler via a key."""

    gen_fn: GenerativeFunction[R]
    args: tuple
    kwargs: dict = Pytree.field(default_factory=dict)

    def get_gen_fn_with_args(self) -> tuple[GenerativeFunction[R], tuple]:
        if self.kwargs:
            return self.gen_fn.handle_kwargs(), (self.args, self.kwargs)
        return self.gen_fn, self.args

    def __matmul__(self, addr) -> R:
        from genjax_tpu.lang.interop import trace

        gen_fn, args = self.get_gen_fn_with_args()
        return trace(addr, gen_fn, args)

    # -- direct invocation sugar (reference `generative_function.py:1585-1640`)

    def __call__(self, key: PRNGKey, *args) -> R:
        full_args = (*self.args, *args)
        if self.kwargs:
            return self.gen_fn.handle_kwargs().simulate(
                key, (full_args, self.kwargs)
            ).get_retval()
        return self.gen_fn.simulate(key, full_args).get_retval()

    def __abstract_call__(self, *args) -> R:
        full_args = (*self.args, *args)
        return self.gen_fn.__abstract_call__(*full_args)


##################
# Update request #
##################


@Pytree.dataclass(match_args=True)
class Update(PrimitiveEditRequest):
    """Request: constrain addresses in `constraint`, reweight the rest.

    The canonical Gen `update` move: new target = same generative function
    with (possibly) changed args + constrained addresses. The backward
    request is an `Update` holding the discarded choices.
    """

    constraint: ChoiceMap
