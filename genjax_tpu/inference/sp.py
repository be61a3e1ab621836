"""GenSP core: `Target`, `Algorithm`, `Marginal` — stochastic probability
interfaces for inference.

Capability parity with reference `_src/inference/sp.py:53-273`.
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
            raise TypeError("Target does not support Marginal generative functions.")

    def importance(self, key: PRNGKey, constraint: ChoiceMap) -> tuple[Trace[R], Weight]:
        merged = self.constraint.merge(constraint)
        return self.p.importance(key, merged, self.args)

    def filter_to_unconstrained(self, choice_map: ChoiceMap) -> ChoiceMap:
        selection = ~self.constraint.get_selection()
        return choice_map.filter(selection)

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

    def estimate_normalizing_constant(self, key: PRNGKey, target: "Target[R]") -> Weight:
        raise NotImplementedError

    def estimate_reciprocal_normalizing_constant(
        self, key: PRNGKey, target: "Target[R]", latent_choices: ChoiceMap, w: Weight
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
        key, sub_key = jax.random.split(key)
        tr = self.gen_fn.simulate(sub_key, args)
        choices = tr.get_choices()
        latent_choices = choices.filter(self.selection)
        key, sub_key = jax.random.split(key)
        # Unbiased density estimate of the marginal at the selected
        # choices: full score minus the marginalized addresses' internal-
        # proposal density. (With `selection = all` this is exactly the
        # trace score — required for e.g. ELBO guides to carry their
        # entropy term.)
        weight = tr.get_score() - tr.project(sub_key, ~self.selection)
        if self.algorithm is None:
            return weight, latent_choices
        target = Target(self.gen_fn, args, latent_choices)
        other_choices = choices.filter(~self.selection)
        Z = self.algorithm.estimate_reciprocal_normalizing_constant(
            key, target, other_choices, weight
        )
        return (Z, latent_choices)

    def estimate_logpdf(self, key: PRNGKey, v: ChoiceMap, *args) -> Score:
        if self.algorithm is None:
            _, weight = self.gen_fn.importance(key, v, args)
            return weight
        target = Target(self.gen_fn, args, v)
        Z = self.algorithm.estimate_normalizing_constant(key, target)
        return Z


def marginal(
    *,
    selection: Selection | None = None,
    algorithm: Any = None,
) -> Callable[[GenerativeFunction[R]], Marginal[R]]:
    """Decorator: turn a generative function into a `Marginal` sample
    distribution over the selected addresses."""
    selection = Selection.all() if selection is None else selection

    def decorator(gen_fn: GenerativeFunction[R]) -> Marginal[R]:
        return Marginal(gen_fn, selection, algorithm)

    return decorator
