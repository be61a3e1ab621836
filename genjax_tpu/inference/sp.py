"""GenSP core: `Target`, `Algorithm`, `Marginal` — stochastic probability
interfaces for inference.

Capability parity with reference `_src/inference/sp.py:53-273` (independent
implementation from the GenSP/RAVI semantics: a `Target` is an unnormalized
posterior; an `Algorithm` is a sample distribution over its latents with
unbiased density estimates; `Marginal` closes a generative function over a
selection of kept addresses).
"""

from typing import Any, Callable, Generic, TypeVar

import jax

from genjax_tpu.core.choice_map import ChoiceMap, Selection
from genjax_tpu.core.concepts import Score, Weight
from genjax_tpu.core.gfi import GenerativeFunction, Trace
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import PRNGKey
from genjax_tpu.distributions.distribution import Distribution

R = TypeVar("R")


@Pytree.dataclass
class Target(Generic[R], Pytree):
    """An unnormalized posterior: a generative function `p`, arguments,
    and a constraint choice map fixing the observed addresses.

    >>> import jax, jax.numpy as jnp
    >>> import genjax_tpu as gx
    >>> from genjax_tpu import Target
    >>> @gx.gen
    ... def model():
    ...     x = gx.normal(0.0, 1.0) @ "x"
    ...     _ = gx.normal(x, 1.0) @ "y"
    >>> target = Target(model, (), gx.ChoiceMap.kw(y=1.0))
    >>> tr, w = target.importance(jax.random.key(0), gx.ChoiceMap.empty())
    >>> float(tr.get_choices()["y"])  # observation pinned
    1.0
    >>> latents = target.filter_to_unconstrained(tr.get_choices())
    >>> "x" in latents, "y" in latents
    (True, False)
    """

    p: GenerativeFunction[R]
    args: tuple
    constraint: ChoiceMap

    def __post_init__(self):
        if isinstance(self.p, Marginal):
            raise TypeError(
                "A Target's model may not itself be a Marginal; marginalize "
                "inside the model instead."
            )
        from genjax_tpu.core import checked

        if checked.is_checked():
            checked.check_args(self.args, "Target")
            checked.check_choice_map(self.constraint, "Target", what="constraint")

    def latent_selection(self) -> Selection:
        """The selection addressing everything the constraint does NOT pin."""
        return ~self.constraint.get_selection()

    def importance(
        self, key: PRNGKey, constraint: ChoiceMap
    ) -> tuple[Trace[R], Weight]:
        """Generate a trace of `p` consistent with both the target's own
        observations and the caller's extra `constraint` (proposed latents
        take priority over nothing — observations always win on overlap)."""
        return self.p.importance(key, self.constraint | constraint, self.args)

    def filter_to_unconstrained(self, choice_map: ChoiceMap) -> ChoiceMap:
        return choice_map.filter(self.latent_selection())

    def __getitem__(self, addr):
        return self.constraint[addr]


SampleDistribution = Distribution[ChoiceMap]
"""Distributions whose return value is a `ChoiceMap` (algorithms,
marginals, custom proposals)."""


class Algorithm(Generic[R], SampleDistribution):
    """Inference algorithms: unbiased density samplers/estimators over the
    latents of a `Target` (the stochastic probability interface of
    GenSP/RAVI), plus the normalizing-constant hooks used by variational
    objectives."""

    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, ChoiceMap]:
        """Sample latents approximately from the target posterior, with an
        unbiased reciprocal density estimate (Defn 3.2, Lew et al 2023)."""
        raise NotImplementedError

    def estimate_logpdf(self, key: PRNGKey, v: ChoiceMap, *args) -> Score:
        """Unbiased density estimate at `v` (Defn 3.1, Lew et al 2023)."""
        raise NotImplementedError

    def estimate_normalizing_constant(
        self, key: PRNGKey, target: "Target[R]"
    ) -> Weight:
        raise NotImplementedError

    def estimate_reciprocal_normalizing_constant(
        self,
        key: PRNGKey,
        target: "Target[R]",
        latent_choices: ChoiceMap,
        w: Weight,
    ) -> Weight:
        raise NotImplementedError


@Pytree.dataclass
class Marginal(Generic[R], SampleDistribution):
    """The marginal distribution of `gen_fn` over the addresses picked out
    by `selection`, optionally using an `Algorithm` for density
    estimation of the marginalized addresses."""

    gen_fn: GenerativeFunction[R]
    selection: Selection = Pytree.field(default_factory=Selection.all)
    algorithm: Any = Pytree.field(default=None)

    def random_weighted(self, key: PRNGKey, *args) -> tuple[Score, ChoiceMap]:
        k_sim, k_proj, k_alg = jax.random.split(key, 3)
        dropped = ~self.selection

        tr = self.gen_fn.simulate(k_sim, args)
        kept_choices = tr.get_choices().filter(self.selection)
        # Naive (algorithm-free) marginal density estimate at the kept
        # choices: the full joint score with the dropped addresses'
        # internal-proposal density divided out. When `selection` is `all`
        # this reduces to the trace score itself — which is what lets ELBO
        # guides carry their entropy term.
        naive = tr.get_score() - tr.project(k_proj, dropped)
        if self.algorithm is None:
            return naive, kept_choices

        # With a user algorithm: hand it the dropped choices and the naive
        # estimate and let it produce a lower-variance reciprocal estimate
        # of the normalizing constant of p(dropped | kept).
        sub_target = Target(self.gen_fn, args, kept_choices)
        dropped_choices = tr.get_choices().filter(dropped)
        est = self.algorithm.estimate_reciprocal_normalizing_constant(
            k_alg, sub_target, dropped_choices, naive
        )
        return est, kept_choices

    def estimate_logpdf(self, key: PRNGKey, v: ChoiceMap, *args) -> Score:
        if self.algorithm is not None:
            return self.algorithm.estimate_normalizing_constant(
                key, Target(self.gen_fn, args, v)
            )
        # Single-sample importance estimate of the marginal density.
        _, w = self.gen_fn.importance(key, v, args)
        return w


def marginal(
    *,
    selection: Selection | None = None,
    algorithm: Any = None,
) -> Callable[[GenerativeFunction[R]], Marginal[R]]:
    """Decorator: turn a generative function into a `Marginal` sample
    distribution over the selected addresses."""
    sel = Selection.all() if selection is None else selection

    def decorator(gen_fn: GenerativeFunction[R]) -> Marginal[R]:
        return Marginal(gen_fn, sel, algorithm)

    return decorator
