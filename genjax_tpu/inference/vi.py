"""Variational inference: ADEV-backed guide distributions and gradient
estimators for variational objectives (ELBO, IWELBO, PWake, QWake).

Capability parity with reference `_src/inference/vi.py:61-232`, built on
native densities instead of TFP.
"""

from typing import Any, Callable

import jax
import jax.numpy as jnp

from genjax_tpu.adev.core import ADEVPrimitive, expectation, sample_primitive
from genjax_tpu.adev.primitives import (
    categorical_enum_parallel,
)
from genjax_tpu.adev.primitives import flip_enum as _flip_enum_prim
from genjax_tpu.adev.primitives import flip_mvd as _flip_mvd_prim
from genjax_tpu.adev.primitives import (
    geometric_reinforce as _geometric_reinforce_prim,
)
from genjax_tpu.adev.primitives import (
    mv_normal_diag_reparam as _mv_normal_diag_reparam_prim,
)
from genjax_tpu.adev.primitives import (
    normal_reinforce as _normal_reinforce_prim,
)
from genjax_tpu.adev.primitives import normal_reparam as _normal_reparam_prim
from genjax_tpu.core.typing import FloatArray, PRNGKey
from genjax_tpu.distributions.distribution import ExactDensity, exact_density
from genjax_tpu.distributions.library import (
    _flip_logpdf,
    _geometric_logpdf,
    _mv_normal_diag_logpdf,
    _normal_logpdf,
)
from genjax_tpu.inference.smc import Importance, ImportanceK
from genjax_tpu.inference.sp import SampleDistribution, Target


def adev_distribution(
    adev_primitive: ADEVPrimitive,
    differentiable_logpdf: Callable[..., Any],
    name: str,
) -> ExactDensity[Any]:
    """Build an `ExactDensity` whose sampler binds an ADEV primitive —
    usable as a distribution inside `@gen` guide programs, with the
    primitive's gradient strategy engaged under `expectation` losses."""

    def sampler(key: PRNGKey, *args) -> Any:
        return sample_primitive(adev_primitive, *args, key=key)

    def logpdf(v, *args) -> FloatArray:
        lp = differentiable_logpdf(v, *args)
        if jnp.shape(lp):
            return jnp.sum(lp)
        return lp

    return exact_density(sampler, logpdf, name)


flip_enum = adev_distribution(_flip_enum_prim, _flip_logpdf, "flip_enum")
flip_mvd = adev_distribution(_flip_mvd_prim, _flip_logpdf, "flip_mvd")
categorical_enum = adev_distribution(
    categorical_enum_parallel,
    lambda v, probs: jnp.log(probs)[v] - jnp.log(jnp.sum(probs)),
    "categorical_enum",
)
normal_reinforce = adev_distribution(
    _normal_reinforce_prim, _normal_logpdf, "normal_reinforce"
)
normal_reparam = adev_distribution(
    _normal_reparam_prim, _normal_logpdf, "normal_reparam"
)
mv_normal_diag_reparam = adev_distribution(
    _mv_normal_diag_reparam_prim, _mv_normal_diag_logpdf, "mv_normal_diag_reparam"
)
geometric_reinforce = adev_distribution(
    _geometric_reinforce_prim,
    lambda v, p: _geometric_logpdf(v, probs=p),
    "geometric_reinforce",
)

GradientEstimate = Any


def ELBO(
    guide: SampleDistribution,
    make_target: Callable[..., Target[Any]],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Gradient estimator for the evidence lower bound: maximizes
    `E_q[log p(x, z) - log q(z)]` (we return the gradient of the negative)."""

    def grad_estimate(key: PRNGKey, args: tuple):
        @expectation
        def _loss(*args):
            target = make_target(*args)
            guide_alg = Importance(target, guide)
            w = guide_alg.estimate_normalizing_constant(key, target)
            return -w

        return _loss.grad_estimate(key, args)

    return grad_estimate


def IWELBO(
    proposal: SampleDistribution,
    make_target: Callable[..., Target[Any]],
    N: int,
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Gradient estimator for the importance-weighted ELBO with N
    particles."""

    def grad_estimate(key: PRNGKey, args: tuple):
        @expectation
        def _loss(*args):
            target = make_target(*args)
            guide = ImportanceK(target, proposal, k_particles=N)
            w = guide.estimate_normalizing_constant(key, target)
            return -w

        return _loss.grad_estimate(key, args)

    return grad_estimate


def PWake(
    posterior_approx: SampleDistribution,
    make_target: Callable[..., Target[Any]],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Wake-phase model-parameter gradient (reweighted wake-sleep)."""

    def grad_estimate(key: PRNGKey, args: tuple):
        key, sub_key1, sub_key2 = jax.random.split(key, 3)

        @expectation
        def _loss(*target_args):
            target = make_target(*target_args)
            _, sample = posterior_approx.random_weighted(sub_key1, target)
            tr, _ = target.importance(sub_key2, sample)
            return -tr.get_score()

        return _loss.grad_estimate(key, args)

    return grad_estimate


def QWake(
    proposal: SampleDistribution,
    posterior_approx: SampleDistribution,
    make_target: Callable[..., Target[Any]],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Wake-phase proposal-parameter gradient (reweighted wake-sleep)."""

    def grad_estimate(key: PRNGKey, args: tuple):
        key, sub_key1, sub_key2 = jax.random.split(key, 3)

        @expectation
        def _loss(*target_args):
            target = make_target(*target_args)
            _, sample = posterior_approx.random_weighted(sub_key1, target)
            w = proposal.estimate_logpdf(sub_key2, sample, target)
            return -w

        return _loss.grad_estimate(key, args)

    return grad_estimate
