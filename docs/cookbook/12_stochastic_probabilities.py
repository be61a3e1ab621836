"""Cookbook: stochastic probabilities — marginals as distributions.

Mirrors the reference cookbook's
inactive/expressivity/{stochastic_probabilities,ravi_stack}.ipynb: the
`Target`/`Algorithm`/`Marginal` stack (GenSP; Lew et al. 2023). A model's
marginal over a subset of its addresses is itself a distribution whose
density can only be *estimated* — and those estimates are unbiased in
exactly the way importance sampling needs, so marginals nest inside other
models and inference stays mathematically sound (RAVI).
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap, Target, gen, marginal, normal
from genjax_tpu import SelectionBuilder as S
from genjax_tpu.inference.smc import ImportanceK


def main():
    key = jax.random.key(0)

    # A two-level model: y's marginal density integrates out x.
    #   x ~ N(0, 1);  y ~ N(x, 1)   =>   y ~ N(0, 2) exactly.
    @gen
    def two_level():
        x = normal(0.0, 1.0) @ "x"
        return normal(x, 1.0) @ "y"

    # --- Marginal: a distribution over selected addresses -------------------
    # `marginal` turns the model into a SampleDistribution over S["y"],
    # using K-particle SIR over the marginalized x for density estimation.
    # The algorithm's construction target is a placeholder; every query
    # re-targets it (via ChangeTarget) to the value being scored. The
    # placeholder must pin the SELECTED addresses (any dummy value works)
    # so its latent space — here just "x" — matches the re-targeted one;
    # an empty-constraint placeholder would leak y into the latents and
    # bias the estimate.
    placeholder = Target(two_level, (), ChoiceMap.kw(y=0.0))
    y_marginal = marginal(
        selection=S["y"],
        algorithm=ImportanceK(placeholder, k_particles=64),
    )(two_level)

    # random_weighted: a sample + an unbiased reciprocal-density estimate.
    w, chm = y_marginal.random_weighted(key)
    y = chm["y"]

    # estimate_logpdf: unbiased in the *density* (not log-density) sense:
    # E[exp(estimate)] = p(y). Averaging K estimates in log space shows
    # convergence to the exact marginal N(0, 2):
    exact = -0.5 * y**2 / 2.0 - 0.5 * jnp.log(2 * jnp.pi * 2.0)
    keys = jax.random.split(jax.random.key(1), 512)
    ests = jax.vmap(
        lambda k: y_marginal.estimate_logpdf(k, ChoiceMap.kw(y=y))
    )(keys)
    pooled = jax.scipy.special.logsumexp(ests) - jnp.log(512)
    assert jnp.abs(pooled - exact) < 0.05, (pooled, exact)

    # --- the RAVI stack: a marginal inside another model ---------------------
    # Because the density estimates are unbiased, a Marginal can be used as
    # a distribution INSIDE a second model; importance weights of the outer
    # model remain proper (properly-weighted, not exact) estimators.
    @gen
    def outer_model():
        z = y_marginal() @ "z"
        return normal(z["y"], 0.5) @ "obs"

    target = Target(outer_model, (), ChoiceMap.kw(obs=1.0))
    alg = ImportanceK(target, k_particles=32)

    # The outer LML estimate converges to the exact evidence of
    # obs ~ N(0, 2 + 0.25). (Each outer particle samples z through the
    # nested marginal — inference over a model whose own density is only
    # estimable, and the evidence estimate stays unbiased.)
    var = 2.0 + 0.25
    exact_lml = -0.5 * 1.0 / var - 0.5 * jnp.log(2 * jnp.pi * var)
    keys = jax.random.split(jax.random.key(2), 256)
    lmls = jax.vmap(lambda k: alg.log_marginal_likelihood_estimate(k))(keys)
    pooled_lml = jax.scipy.special.logsumexp(lmls) - jnp.log(256)
    assert jnp.abs(pooled_lml - exact_lml) < 0.05, (pooled_lml, exact_lml)

    print("stochastic-probabilities cookbook: all checks passed")


if __name__ == "__main__":
    main()
