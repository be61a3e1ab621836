"""`Distribution` and `ExactDensity`: primitive generative functions.

Capability parity with reference
`_src/generative_functions/distributions/distribution.py:55-500`:
the stochastic-probability interface (`random_weighted`/`estimate_logpdf`)
with the full GFI on top (generate with value/Mask/empty constraint
branching, Update/Regenerate edit weight math, project), `ExactDensity`
(`sample` + `logpdf`), and the `exact_density` factory.
"""

import warnings
from typing import Callable, Generic, TypeVar

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from genjax_tpu.core import checked
from genjax_tpu.core.checkify import optional_check
from genjax_tpu.core.choice_map import ChoiceMap, Selection
from genjax_tpu.core.concepts import (
    Argdiffs,
    EditRequest,
    NotSupportedEditRequest,
    Retdiff,
    Score,
    Weight,
)
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.gfi import GenerativeFunction, Trace, Update
from genjax_tpu.core.mask import Mask
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.requests import Regenerate
from genjax_tpu.core.staging import FlagOp, to_shape_fn
from genjax_tpu.core.typing import PRNGKey

R = TypeVar("R")


@Pytree.dataclass
class DistributionTrace(Generic[R], Trace[R]):
    gen_fn: GenerativeFunction[R]
    args: tuple
    value: R
    score: Score

    def get_args(self) -> tuple:
        return self.args

    def get_retval(self) -> R:
        return self.value

    def get_gen_fn(self) -> GenerativeFunction[R]:
        return self.gen_fn

    def get_score(self) -> Score:
        return self.score

    def get_choices(self) -> ChoiceMap:
        return ChoiceMap.choice(self.value)


class Distribution(Generic[R], GenerativeFunction[R]):
    """Generative functions over a single (unaddressed) choice, specified by
    the stochastic probability interface."""

    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, R]:
        """Sample a value and return (score-estimate, value)."""
        raise NotImplementedError

    def estimate_logpdf(self, key: PRNGKey, v: R, *args) -> Score:
        """Return an unbiased density(-estimate) of `v` in log space."""
        raise NotImplementedError

    # -- GFI ----------------------------------------------------------------

    def simulate(self, key: PRNGKey, args: tuple) -> Trace[R]:
        if checked.is_checked():
            checked.check_key(key, f"{type(self).__name__}.simulate")
            checked.check_args(args, f"{type(self).__name__}.simulate")
        (w, v) = self.random_weighted(key, *args)
        return DistributionTrace(self, args, v, w)

    def generate(
        self, key: PRNGKey, constraint: ChoiceMap, args: tuple
    ) -> tuple[Trace[R], Weight]:
        if checked.is_checked():
            checked.check_key(key, f"{type(self).__name__}.generate")
            checked.check_choice_map(constraint, f"{type(self).__name__}.generate")
            checked.check_args(args, f"{type(self).__name__}.generate")
        v = constraint.get_value()
        match v:
            case None:
                tr = self.simulate(key, args)
                return tr, jnp.zeros(())
            case Mask(value, flag):

                def _importance(key, v):
                    w = self.estimate_logpdf(key, v, *args)
                    return (w, w, v)

                def _simulate(key, v):
                    score, new_v = self.random_weighted(key, *args)
                    return (score, jnp.zeros(()), new_v)

                score, w, new_v = FlagOp.cond(flag, _importance, _simulate, key, value)
                return DistributionTrace(self, args, new_v, score), w
            case _:
                w = self.estimate_logpdf(key, v, *args)
                return DistributionTrace(self, args, v, w), w

    def project(
        self, key: PRNGKey, trace: Trace[R], selection: Selection
    ) -> Weight:
        return jnp.where(selection.check(), trace.get_score(), jnp.zeros(()))

    def assess(self, sample: ChoiceMap, args: tuple):
        raise NotImplementedError

    # -- edit ------------------------------------------------------------------

    def edit_update(
        self,
        key: PRNGKey,
        trace: Trace[R],
        constraint: ChoiceMap,
        argdiffs: Argdiffs,
    ) -> tuple[Trace[R], Weight, Retdiff, Update]:
        primals = Diff.tree_primal(argdiffs)
        match constraint.get_value():
            case Mask() as masked_value:

                def _constrained(key, new_value, _):
                    fwd = self.estimate_logpdf(key, new_value, *primals)
                    return (new_value, fwd - trace.get_score(), fwd)

                def _retained(key, _, old_value):
                    fwd = self.estimate_logpdf(key, old_value, *primals)
                    return (old_value, fwd - trace.get_score(), fwd)

                flag = masked_value.primal_flag()
                new_value = masked_value.value
                old_choices = trace.get_choices()
                old_value = old_choices.get_value()
                new_value, w, score = FlagOp.cond(
                    flag, _constrained, _retained, key, new_value, old_value
                )
                return (
                    DistributionTrace(self, primals, new_value, score),
                    w,
                    Diff.unknown_change(new_value),
                    Update(old_choices.mask(flag)),
                )
            case None:
                # Retained value, possibly-changed args: w = P'(v) - P(v).
                v = trace.get_choices().get_value()
                fwd = self.estimate_logpdf(key, v, *primals)
                w = fwd - trace.get_score()
                new_tr = DistributionTrace(self, primals, v, fwd)
                return (new_tr, w, Diff.no_change(v), Update(ChoiceMap.empty()))
            case v:
                # Constrained to new value: w = P'(v') - P(v); discard old.
                fwd = self.estimate_logpdf(key, v, *primals)
                w = fwd - trace.get_score()
                new_tr = DistributionTrace(self, primals, v, fwd)
                discard = trace.get_choices()
                return (new_tr, w, Diff.unknown_change(v), Update(discard))

    def edit_regenerate(
        self,
        key: PRNGKey,
        trace: Trace[R],
        selection: Selection,
        argdiffs: Argdiffs,
    ) -> tuple[Trace[R], Weight, Retdiff, EditRequest]:
        # `selection.check()` may be a traced flag (MaskedSel); don't force
        # it through Python bool (`in` would).
        check = selection.check()
        primals = Diff.tree_primal(argdiffs)
        if FlagOp.concrete_true(check):
            # Resample from the prior under new args: weight cancels except
            # for the old score.
            w, new_v = self.random_weighted(key, *primals)
            incremental_w = w - trace.get_score()
            old_v = trace.get_retval()
            new_trace = DistributionTrace(self, primals, new_v, w)
            return (
                new_trace,
                incremental_w,
                Diff.unknown_change(new_v),
                Update(ChoiceMap.choice(old_v)),
            )
        elif FlagOp.concrete_false(check):
            if Diff.static_check_no_change(argdiffs):
                return (
                    trace,
                    jnp.zeros(()),
                    Diff.no_change(trace.get_retval()),
                    Update(ChoiceMap.empty()),
                )
            chm = trace.get_choices()
            new_score, _ = self.assess(chm, primals)
            new_trace = DistributionTrace(self, primals, chm.get_value(), new_score)
            return (
                new_trace,
                new_score - trace.get_score(),
                Diff.no_change(trace.get_retval()),
                Update(ChoiceMap.empty()),
            )
        else:
            # Traced selection check (e.g. a per-index selection sliced
            # inside `lax.scan`/`vmap`): compute both outcomes and select
            # densely — the TPU-friendly realization (no host control
            # flow; XLA fuses the select into the density pass).
            old_v = trace.get_retval()

            def _resample(key):
                w, new_v = self.random_weighted(key, *primals)
                return new_v, w

            def _keep(key):
                return old_v, self.estimate_logpdf(key, old_v, *primals)

            new_v, new_score = FlagOp.cond(check, _resample, _keep, key)
            new_trace = DistributionTrace(self, primals, new_v, new_score)
            return (
                new_trace,
                new_score - trace.get_score(),
                Diff.unknown_change(new_v),
                Update(ChoiceMap.choice(old_v).mask(check)),
            )

    def edit(
        self,
        key: PRNGKey,
        trace: Trace[R],
        edit_request: EditRequest,
        argdiffs: Argdiffs,
    ) -> tuple[Trace[R], Weight, Retdiff, EditRequest]:
        match edit_request:
            case Update(chm):
                return self.edit_update(key, trace, chm, argdiffs)
            case Regenerate(selection):
                return self.edit_regenerate(key, trace, selection, argdiffs)
            case _:
                raise NotSupportedEditRequest(edit_request)


################
# ExactDensity #
################


class ExactDensity(Generic[R], Distribution[R]):
    """Distributions with exact `sample`/`logpdf` implementations."""

    def sample(self, key: PRNGKey, *args) -> R:
        raise NotImplementedError

    def logpdf(self, v: R, *args, **kwargs) -> Score:
        raise NotImplementedError

    def __abstract_call__(self, *args):
        key = jax.eval_shape(lambda: jax.random.key(0))
        return to_shape_fn(self.sample, jnp.zeros)(key, *args)

    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, R]:
        v = self.sample(key, *args)
        w = self.estimate_logpdf(key, v, *args)
        return (w, v)

    def estimate_logpdf(self, key: PRNGKey, v: R, *args) -> Weight:
        w = self.logpdf(v, *args)
        if jnp.shape(w):
            return jnp.sum(w)
        return w

    def assess(self, sample: ChoiceMap, args: tuple) -> tuple[Weight, R]:
        key = jax.random.key(0)
        v = sample.get_value()
        match v:
            case Mask(value, flag):

                def _check():
                    checkify.check(
                        jnp.all(flag if not isinstance(flag, Diff) else flag.primal),
                        "Attempted to unmask when a mask flag is False: the "
                        "masked value is invalid.\n",
                    )

                optional_check(_check)
                w = self.estimate_logpdf(key, value, *args)
                return w, value
            case _:
                w = self.estimate_logpdf(key, v, *args)
                return w, v


def canonicalize_distribution_name(s: str) -> str:
    t = []
    for c in s:
        if c.isupper():
            if t:
                t.append("_")
            t.append(c.lower())
        else:
            t.append(c)
    return "genjax_tpu." + "".join(t)


def exact_density(
    sample: Callable[..., R],
    logpdf: Callable[..., Score],
    name: str | None = None,
) -> ExactDensity[R]:
    """Construct a singleton `ExactDensity` from `sample`/`logpdf` callables.

    >>> import jax, jax.numpy as jnp
    >>> from genjax_tpu.distributions.distribution import exact_density
    >>> rayleigh = exact_density(
    ...     lambda key, s: s * jnp.sqrt(-2.0 * jnp.log(jax.random.uniform(key))),
    ...     lambda v, s: jnp.log(v / s**2) - v**2 / (2 * s**2),
    ...     "rayleigh",
    ... )
    >>> tr = rayleigh.simulate(jax.random.key(0), (1.0,))
    >>> bool(tr.get_retval() > 0)
    True
    >>> score, _ = rayleigh.assess(tr.get_choices(), (1.0,))
    >>> bool(jnp.isclose(score, tr.get_score()))
    True
    """
    if name is None:
        warnings.warn("You should supply a name argument to exact_density")
        name = "unknown"

    def kwargle(f, a0, args, kwargs):
        # Kwargs reach distributions as an `(args, kwargs)` package when the
        # caller used keyword syntax; unpack transparently.
        if len(args) == 2 and isinstance(args[1], dict):
            return f(a0, *args[0], **args[1])
        return f(a0, *args, **kwargs)

    T = type(
        canonicalize_distribution_name(name),
        (ExactDensity,),
        {
            "sample": lambda self, key, *args, **kwargs: kwargle(
                sample, key, args, kwargs
            ),
            "logpdf": lambda self, v, *args, **kwargs: kwargle(logpdf, v, args, kwargs),
            "handle_kwargs": lambda self: self,
        },
    )
    return Pytree.dataclass(T)()
