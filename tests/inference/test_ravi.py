"""RAVI / nested-marginal tests: Algorithms as density estimators inside
Marginal, and the trained-guide nested SMC pipeline."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection, Target, gen, normal
from genjax_tpu.inference.smc import ImportanceK
from genjax_tpu.inference.sp import Marginal
from genjax_tpu.models.ravi import run_ravi


class TestNestedMarginal:
    def test_marginal_with_algorithm_density(self):
        """Marginal over 'x' of a two-variable model, with ImportanceK
        estimating the marginalized density: E[exp(estimate_logpdf)] must
        match the true marginal density p(x)."""

        @gen
        def joint():
            x = normal(0.0, 1.0) @ "x"
            _ = normal(x, 1.0) @ "y"

        # Marginal of y (integrating x out): y ~ N(0, sqrt(2))
        marg_y = Marginal(
            joint,
            Selection.at["y"],
            None,
        )
        # algorithm=None path: E[w] unbiased for p(y)
        v = ChoiceMap.kw(y=1.0)
        keys = jax.random.split(jax.random.key(0), 3000)
        lps = jax.vmap(lambda k: marg_y.estimate_logpdf(k, v))(keys)
        exact = -0.25 - 0.5 * jnp.log(2 * jnp.pi * 2.0)
        assert jnp.allclose(
            jnp.log(jnp.mean(jnp.exp(lps))), exact, atol=0.05
        )

    def test_marginal_algorithm_random_weighted(self):
        @gen
        def joint():
            x = normal(0.0, 1.0) @ "x"
            _ = normal(x, 1.0) @ "y"

        def make_alg(target):
            return ImportanceK(target, k_particles=64)

        # random_weighted with a nested algorithm for the reciprocal
        # normalizing constant (RAVI): draws y and returns an unbiased
        # reciprocal density estimate.
        marg_y = Marginal(joint, Selection.at["y"], None)
        keys = jax.random.split(jax.random.key(1), 2000)
        ws, chms = jax.vmap(lambda k: marg_y.random_weighted(k))(keys)
        ys = chms["y"]
        # E[1/w | y] = 1/p(y): check on average across draws,
        # E[p(y)/w] = 1 where p is the true marginal density
        exact_lp = -(ys**2) / 4.0 - 0.5 * jnp.log(2 * jnp.pi * 2.0)
        ratios = jnp.exp(exact_lp - ws)
        assert jnp.allclose(jnp.mean(ratios), 1.0, atol=0.05)


class TestRaviPipeline:
    def test_trained_guide_tightens_lml(self):
        params, lml_guided, lml_prior, exact = run_ravi(
            jax.random.key(0), n_train=300, k_particles=20_000
        )
        # guide learned the posterior location (posterior mean = 1.6)
        assert jnp.abs(params[0] - 1.6) < 0.25
        # both estimators near-exact at this K; guided at least as close
        assert jnp.abs(lml_guided - exact) < 0.02
        assert jnp.abs(lml_prior - exact) < 0.1
        assert jnp.abs(lml_guided - exact) <= jnp.abs(lml_prior - exact) + 0.02
