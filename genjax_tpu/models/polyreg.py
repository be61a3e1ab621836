"""Benchmark config 2: Bayesian polynomial regression — importance
sampling with MH rejuvenation (the reference cookbook model family)."""

import jax
import jax.numpy as jnp

from genjax_tpu import ChoiceMap, Selection, gen, mv_normal_diag, normal
from genjax_tpu.inference.mcmc import _chain_axes, mh, share_chain_args
from genjax_tpu.inference.requests import MALA
from genjax_tpu.inference.smc import ParticleCollection
from genjax_tpu.inference.sp import Target


@gen
def polynomial_regression(xs, obs_noise):
    coeffs = mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "coeffs"
    design = jnp.stack([jnp.ones_like(xs), xs, xs**2], axis=-1)
    mean = design @ coeffs
    _ = normal(mean, obs_noise * jnp.ones_like(xs)) @ "ys"
    return mean


def run_is_mh(
    key,
    xs,
    ys,
    n_particles: int = 1024,
    n_rejuvenation: int = 20,
    obs_noise: float = 0.3,
    step_size: float = 1e-3,
):
    """Importance-sample a particle collection, then MALA-rejuvenate the
    coefficients. Returns (lml estimate, posterior coefficient draws)."""
    target = Target(polynomial_regression, (xs, obs_noise), ChoiceMap.kw(ys=ys))
    k_init, k_rejuv = jax.random.split(key)
    init_keys = jax.random.split(k_init, n_particles)
    trs, ws = jax.vmap(target.importance, in_axes=(0, None))(
        init_keys, ChoiceMap.empty()
    )
    collection = ParticleCollection(trs, ws, jnp.array(True))
    lml = collection.get_log_marginal_likelihood_estimate()
    collection = collection.resample(jax.random.fold_in(k_rejuv, 0), "systematic")

    request = MALA(Selection.at["coeffs"], jnp.asarray(step_size))

    # Rejuvenation reads the design points every density pass: store ONE
    # shared copy of the model args across particles (see
    # mcmc.share_chain_args) instead of the vmap-broadcast per-particle
    # copies.
    particles0 = share_chain_args(
        collection.get_particles(), (xs, obs_noise)
    )
    axes = _chain_axes(particles0, n_particles)

    def sweep(particles, k):
        sub_keys = jax.random.split(k, n_particles)
        new_particles = jax.vmap(
            lambda kk, tr: mh(kk, tr, request)[0], in_axes=(0, axes), out_axes=axes
        )(sub_keys, particles)
        return new_particles, None

    particles, _ = jax.lax.scan(
        sweep,
        particles0,
        jax.random.split(k_rejuv, n_rejuvenation),
    )
    return lml, particles.get_choices()["coeffs"]
