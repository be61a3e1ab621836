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


# -- optimization driver and automatic guides (beyond the reference) ---------


def fit(
    key: PRNGKey,
    grad_estimate: Callable[[PRNGKey, tuple], GradientEstimate],
    init_params: tuple,
    n_steps: int = 500,
    optimizer: Any = None,
):
    """Run a variational objective to convergence: an optax loop inside
    one `lax.scan` over the gradient estimator (the loop the reference's
    users — and this repo's tests — hand-roll).

    `grad_estimate` is any objective factory output (`ELBO(...)`,
    `IWELBO(...)`, ...); `init_params` is the tuple of variational
    parameters the objective's `make_target` consumes. Returns
    `(params, grad_norm_history)`.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(init_params)

    def step(carry, step_key):
        params, opt_state = carry
        grads = grad_estimate(step_key, params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = jnp.sqrt(
            sum(
                jnp.sum(jnp.square(g))
                for g in jax.tree_util.tree_leaves(grads)
            )
        )
        return (params, opt_state), gnorm

    keys = jax.random.split(key, n_steps)
    (params, _), gnorms = jax.lax.scan(step, (init_params, opt_state), keys)
    return params, gnorms


def mean_field_guide(latent_specs):
    """Build a mean-field Gaussian guide over flat real-valued latent
    addresses. `latent_specs` is a dict `{address: shape}` (shapes () or
    (n,)). The guide reads its parameters from the LAST target argument:
    a dict `{address: {"mu": ..., "log_sigma": ...}}`."""
    from genjax_tpu import gen, marginal

    specs = tuple(sorted((str(a), tuple(s)) for a, s in latent_specs.items()))
    for addr, shape in specs:
        if len(shape) > 1:
            raise NotImplementedError(
                f"mean_field_guide: latent {addr!r} has rank-{len(shape)} "
                "shape; only scalar and vector latents are supported "
                "(reshape in the model, or write the guide by hand)."
            )

    @marginal()
    @gen
    def guide(target):
        params = target.args[-1]
        for addr, shape in specs:
            mu = params[addr]["mu"]
            sigma = jnp.exp(params[addr]["log_sigma"])
            if shape == ():
                _ = normal_reparam(mu, sigma) @ addr
            else:
                _ = mv_normal_diag_reparam(mu, sigma) @ addr

    return guide


def mean_field_init(latent_specs):
    """Zero-initialized parameters for `mean_field_guide`."""
    return {
        str(a): {
            "mu": jnp.zeros(tuple(s)),
            "log_sigma": jnp.zeros(tuple(s)),
        }
        for a, s in latent_specs.items()
    }


def _discover_flat_latents(model, args, constraint):
    """Top-level unconstrained addresses and shapes via a zero trace."""
    import jax.tree_util as jtu

    chm = model.get_zero_trace(*args).get_choices()
    latents = chm.filter(~constraint.get_selection())
    specs = {}
    for path, leaf in jtu.tree_leaves_with_path(latents):
        keys = [k.key for k in path if isinstance(k, jtu.DictKey)]
        if len(keys) != 1:
            raise NotImplementedError(
                "advi: only flat (top-level) latent addresses are "
                f"auto-guided; found nested path {path}. Write the guide "
                "with mean_field_guide/by hand for nested models."
            )
        if not jnp.issubdtype(jnp.result_type(leaf), jnp.floating):
            raise NotImplementedError(
                f"advi: latent {keys[0]!r} has dtype "
                f"{jnp.result_type(leaf)} — a Gaussian mean-field guide "
                "only makes sense for real-valued latents; marginalize "
                "discrete sites in the model or write the guide by hand "
                "(e.g. with vi.flip_enum / categorical_enum sites)."
            )
        specs[keys[0]] = jnp.shape(leaf)
    return specs


def advi(
    key: PRNGKey,
    model: Any,
    args: tuple,
    constraint: Any,
    n_steps: int = 1000,
    optimizer: Any = None,
):
    """Automatic mean-field VI: discover the model's (flat, real-valued)
    latent addresses from a zero trace, build a Gaussian guide, and fit
    the ELBO. Returns `(params, guide, make_target, grad_norms)`;
    posterior draws come from the fitted guide, e.g.::

        params, guide, make_target, _ = advi(key, model, args, obs)
        _, latents = guide.random_weighted(k2, make_target(params))
    """
    import jax.tree_util as jtu

    specs = _discover_flat_latents(model, args, constraint)
    guide = mean_field_guide(specs)
    init = mean_field_init(specs)
    # Variational params ride through the target args so ADEV
    # differentiates them; the model itself ignores the extra argument.
    # The ADEV transform passes objective arguments LEAF-WISE (pytrees
    # are flattened before the staged source sees them), so the
    # objective works on the flattened parameter leaves and the target
    # constructor reassembles the dict.
    wrapped = model.contramap(lambda *a: a[:-1])
    leaves, treedef = jtu.tree_flatten(init)

    def make_target(params):
        return Target(wrapped, (*args, params), constraint)

    def make_target_leafwise(*param_leaves):
        return make_target(jtu.tree_unflatten(treedef, list(param_leaves)))

    grad = ELBO(guide, make_target_leafwise)
    flat, gnorms = fit(
        key, grad, tuple(leaves), n_steps=n_steps, optimizer=optimizer
    )
    params = jtu.tree_unflatten(treedef, list(flat))
    return params, guide, make_target, gnorms
