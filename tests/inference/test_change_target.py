"""ChangeTarget and custom-proposal Importance tests."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Target, gen, normal
from genjax_tpu.inference.smc import ChangeTarget, Importance, ImportanceK


@gen
def model(prior_scale):
    x = normal(0.0, prior_scale) @ "x"
    _ = normal(x, 1.0) @ "y"
    return x


def exact_lml(y, prior_scale):
    var = prior_scale**2 + 1.0
    return -0.5 * y**2 / var - 0.5 * jnp.log(2 * jnp.pi * var)


class TestChangeTarget:
    def test_reweight_to_new_target(self):
        """Particles drawn for one target, reweighted to another: LML must
        estimate the NEW target's marginal."""
        t1 = Target(model, (1.0,), ChoiceMap.kw(y=1.0))
        t2 = Target(model, (2.0,), ChoiceMap.kw(y=1.0))
        alg = ChangeTarget(ImportanceK(t1, k_particles=4000), t2)
        keys = jax.random.split(jax.random.key(0), 50)
        lmls = jax.vmap(
            lambda k: alg.run_smc(k).get_log_marginal_likelihood_estimate()
        )(keys)
        assert jnp.allclose(
            jnp.log(jnp.mean(jnp.exp(lmls))), exact_lml(1.0, 2.0), atol=0.05
        )

    def test_change_target_random_weighted(self):
        t1 = Target(model, (1.0,), ChoiceMap.kw(y=1.0))
        t2 = Target(model, (2.0,), ChoiceMap.kw(y=1.0))
        alg = ImportanceK(t1, k_particles=500)
        # random_weighted internally re-targets via ChangeTarget(alg, t2)
        keys = jax.random.split(jax.random.key(1), 800)
        _, chms = jax.vmap(alg.random_weighted, in_axes=(0, None))(keys, t2)
        # posterior mean under t2: y * s^2/(s^2+1) = 0.8
        assert jnp.allclose(jnp.mean(chms["x"]), 0.8, atol=0.06)


class TestCustomProposal:
    def test_importance_with_proposal(self):
        """A custom proposal q concentrated at the posterior tightens the
        single-particle weight variance."""

        @g.marginal()
        @gen
        def q(target):
            # posterior for prior_scale=1, y=1: N(0.5, 1/sqrt(2))
            _ = normal(0.5, 1.0 / jnp.sqrt(2.0)) @ "x"

        t = Target(model, (1.0,), ChoiceMap.kw(y=1.0))
        keys = jax.random.split(jax.random.key(2), 4000)

        def lml_est(alg):
            col = jax.vmap(alg.run_smc)(keys)
            return col.get_log_weights()[:, 0]

        ws_prior = lml_est(Importance(t))
        ws_q = lml_est(Importance(t, q))
        exact = exact_lml(1.0, 1.0)
        # both unbiased...
        assert jnp.allclose(
            jnp.log(jnp.mean(jnp.exp(ws_prior))), exact, atol=0.05
        )
        assert jnp.allclose(jnp.log(jnp.mean(jnp.exp(ws_q))), exact, atol=0.05)
        # ...but the posterior-matched proposal has much lower variance
        assert jnp.var(ws_q) < 0.3 * jnp.var(ws_prior)
