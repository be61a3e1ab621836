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
from genjax_tpu.adev.primitives import dirichlet_implicit as _dirichlet_implicit_prim
from genjax_tpu.adev.primitives import gamma_implicit as _gamma_implicit_prim
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
    _dirichlet_logpdf,
    _flip_logpdf,
    _gamma_logpdf,
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
# Implicit-reparameterized guides over positive / simplex supports (new
# relative to the reference, which ships only the strategies above):
gamma_reparam = adev_distribution(
    _gamma_implicit_prim, _gamma_logpdf, "gamma_reparam"
)
dirichlet_reparam = adev_distribution(
    _dirichlet_implicit_prim, _dirichlet_logpdf, "dirichlet_reparam"
)

GradientEstimate = Any

# Each objective below is a factory returning `grad_estimate(key, args) ->
# pytree`: an unbiased estimate of the gradient of a (negated) variational
# objective w.r.t. `args`. The stochastic loss body is staged under
# `@expectation`, so every guide sample site's ADEV strategy (REINFORCE /
# enumeration / reparameterization) participates in the estimate.
#
# Derivations (re-derived for this build; the estimators are standard):
#  * ELBO(q)   = E_q[log p(x,z) - log q(z)]  — the 1-particle log-Ẑ of
#    importance sampling with q as proposal is exactly that integrand.
#  * IWELBO_N  = E[log (1/N) Σ_i p(x,z_i)/q(z_i)]  (Burda et al. 2016) —
#    the N-particle SIR log-Ẑ.
#  * PWake     = E_{z~q*}[-log p(x,z)]  — wake-phase θ gradient of
#    reweighted wake-sleep (Bornschein & Bengio 2015); the sampler q* is
#    held fixed (non-differentiated keys), only the model score is
#    differentiated.
#  * QWake     = E_{z~q*}[-log q(z)]  — sleep/wake-phase φ gradient: fit
#    the proposal density to samples from the posterior approximation.


def ELBO(
    guide: SampleDistribution,
    make_target: Callable[..., Target[Any]],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Gradient estimator for the (negated) evidence lower bound.

    >>> import jax
    >>> import genjax_tpu as gx
    >>> from genjax_tpu.inference import Target, vi
    >>> @gx.gen
    ... def model(_vmu):
    ...     mu = gx.normal(0.0, 1.0) @ "mu"
    ...     _ = gx.normal(mu, 1.0) @ "y"
    >>> @gx.marginal()
    ... @gx.gen
    ... def guide(target):
    ...     (vmu,) = target.args
    ...     _ = vi.normal_reparam(vmu, 1.0) @ "mu"
    >>> step = vi.ELBO(guide, lambda vmu: Target(model, (vmu,), gx.ChoiceMap.kw(y=2.0)))
    >>> (grad,) = step(jax.random.key(0), (0.0,))
    >>> bool(grad < 0)  # pushes the variational mean toward the posterior (1.0)
    True
    """

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        @expectation
        def negated_elbo(*target_args):
            target = make_target(*target_args)
            log_z_hat = Importance(target, guide).estimate_normalizing_constant(
                key, target
            )
            return -log_z_hat

        return negated_elbo.grad_estimate(key, args)

    return grad_estimate


def IWELBO(
    proposal: SampleDistribution,
    make_target: Callable[..., Target[Any]],
    N: int,
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Gradient estimator for the (negated) N-particle importance-weighted
    ELBO. Tighter than ELBO for N > 1; the proposal's sample sites are
    vmapped across particles, so every gradient strategy must be
    vmap-sound (see `adev.primitives` batched strategies)."""

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        @expectation
        def negated_iwelbo(*target_args):
            target = make_target(*target_args)
            sir = ImportanceK(target, proposal, k_particles=N)
            return -sir.estimate_normalizing_constant(key, target)

        return negated_iwelbo.grad_estimate(key, args)

    return grad_estimate


def PWake(
    posterior_approx: SampleDistribution,
    make_target: Callable[..., Target[Any]],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Wake-phase model-parameter (θ) gradient of reweighted wake-sleep."""

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        # Three DISJOINT streams: the ADEV walk derives strategy subkeys
        # from its key by splitting, and `split(k)[i] == fold_in(k, i)`,
        # so handing the walk the raw parent while the closure holds
        # fold_in(key, i) keys would re-couple them.
        k_walk, k_draw, k_score = jax.random.split(key, 3)

        @expectation
        def wake_theta_loss(*target_args):
            target = make_target(*target_args)
            _, latents = posterior_approx.random_weighted(k_draw, target)
            model_trace, _ = target.importance(k_score, latents)
            return -model_trace.get_score()

        return wake_theta_loss.grad_estimate(k_walk, args)

    return grad_estimate


def QWake(
    proposal: SampleDistribution,
    posterior_approx: SampleDistribution,
    make_target: Callable[..., Target[Any]],
) -> Callable[[PRNGKey, tuple], GradientEstimate]:
    """Wake-phase proposal-parameter (φ) gradient of reweighted
    wake-sleep: drives `proposal`'s density toward `posterior_approx`'s
    samples."""

    def grad_estimate(key: PRNGKey, args: tuple) -> GradientEstimate:
        # Disjoint streams — see PWake for the split-vs-fold_in aliasing.
        k_walk, k_draw, k_density = jax.random.split(key, 3)

        @expectation
        def wake_phi_loss(*target_args):
            target = make_target(*target_args)
            _, latents = posterior_approx.random_weighted(k_draw, target)
            return -proposal.estimate_logpdf(k_density, latents, target)

        return wake_phi_loss.grad_estimate(k_walk, args)

    return grad_estimate
