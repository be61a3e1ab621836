"""SMC exactness tests against analytically computable marginals
(parity: reference tests/inference/test_smc.py idioms)."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Target
from genjax_tpu.inference.smc import (
    ImportanceK,
    Importance,
    SMCDriver,
    ess,
    multinomial_resample,
    residual_resample,
    stratified_resample,
    systematic_resample,
)


@g.gen
def flip_flip():
    v1 = g.flip(0.5) @ "v1"
    p = jnp.where(v1, 0.9, 0.3)
    v2 = g.flip(p) @ "v2"
    return v2


def exact_log_marginal_v2_true():
    # P(v2=True) = 0.5*0.9 + 0.5*0.3 = 0.6
    return jnp.log(0.6)


class TestImportanceK:
    def test_lml_estimate_close_to_exact(self):
        target = Target(flip_flip, (), ChoiceMap.kw(v2=True))
        alg = ImportanceK(target, k_particles=1000)
        keys = jax.random.split(jax.random.key(0), 100)
        lmls = jax.vmap(alg.log_marginal_likelihood_estimate)(keys)
        assert jnp.allclose(
            jnp.mean(jnp.exp(lmls)), 0.6, atol=2e-2
        )

    def test_random_weighted_posterior(self):
        # P(v1=True | v2=True) = 0.45/0.6 = 0.75
        target = Target(flip_flip, (), ChoiceMap.kw(v2=True))
        alg = ImportanceK(target, k_particles=200)
        keys = jax.random.split(jax.random.key(1), 500)
        _, chms = jax.vmap(alg.random_weighted, in_axes=(0, None))(keys, target)
        assert jnp.allclose(jnp.mean(chms["v1"]), 0.75, atol=0.05)

    def test_estimate_logpdf_consistency(self):
        target = Target(flip_flip, (), ChoiceMap.kw(v2=True))
        alg = ImportanceK(target, k_particles=500)
        # E[exp(estimate_logpdf)] == exact posterior prob of the latent
        keys = jax.random.split(jax.random.key(2), 400)
        v = ChoiceMap.kw(v1=True)
        lps = jax.vmap(lambda k: alg.estimate_logpdf(k, v, target))(keys)
        assert jnp.allclose(jnp.mean(jnp.exp(lps)), 0.75, atol=0.05)

    def test_importance_single_particle(self):
        target = Target(flip_flip, (), ChoiceMap.kw(v2=True))
        alg = Importance(target)
        keys = jax.random.split(jax.random.key(3), 3000)
        lmls = jax.vmap(alg.log_marginal_likelihood_estimate)(keys)
        assert jnp.allclose(jnp.mean(jnp.exp(lmls)), 0.6, atol=0.02)


class TestResampling:
    @pytest.mark.parametrize(
        "resampler",
        [
            multinomial_resample,
            systematic_resample,
            stratified_resample,
            residual_resample,
        ],
    )
    def test_resampler_unbiased_counts(self, resampler):
        n = 1000
        lw = jnp.log(jnp.array([0.5, 0.3, 0.2]))
        keys = jax.random.split(jax.random.key(0), 200)
        ancs = jax.vmap(lambda k: resampler(k, lw, n))(keys)
        freq = jnp.mean(ancs.reshape(-1)[:, None] == jnp.arange(3), axis=0)
        assert jnp.allclose(freq, jnp.array([0.5, 0.3, 0.2]), atol=0.01)

    def test_systematic_low_variance(self):
        n = 1000
        lw = jnp.log(jnp.ones(n) / n)
        anc = systematic_resample(jax.random.key(0), lw, n)
        # equal weights -> identity-ish permutation, every index exactly once
        counts = jnp.bincount(anc, length=n)
        assert jnp.all(counts == 1)

    def test_ess(self):
        assert jnp.allclose(ess(jnp.zeros(100)), 100.0, atol=1e-3)
        degenerate = jnp.array([0.0] + [-jnp.inf] * 99)
        assert jnp.allclose(ess(degenerate), 1.0, atol=1e-3)

    def test_collection_resample_preserves_lml(self):
        target = Target(flip_flip, (), ChoiceMap.kw(v2=True))
        alg = ImportanceK(target, k_particles=256)
        col = alg.run_smc(jax.random.key(0))
        lml_before = col.get_log_marginal_likelihood_estimate()
        col2 = col.resample(jax.random.key(1), "systematic")
        assert jnp.allclose(
            col2.get_log_marginal_likelihood_estimate(), lml_before, atol=1e-5
        )
        assert jnp.allclose(col2.get_ess(), 256.0, atol=1e-3)


class TestSMCDriver:
    def test_init_extend_matches_joint(self):
        @g.gen
        def two_step():
            x = g.normal(0.0, 1.0) @ "x"
            y = g.normal(x, 1.0) @ "y"
            return y

        driver = SMCDriver(n_particles=5000)
        target0 = Target(two_step, (), ChoiceMap.empty())
        col = driver.init(jax.random.key(0), target0)
        col = driver.extend(jax.random.key(1), col, ChoiceMap.kw(y=1.0))
        # LML should estimate log p(y=1.0) = log N(1; 0, sqrt(2))
        exact = -0.25 - 0.5 * jnp.log(2 * jnp.pi * 2.0)
        assert jnp.allclose(
            col.get_log_marginal_likelihood_estimate(), exact, atol=0.05
        )

    def test_maybe_resample_triggers(self):
        target = Target(flip_flip, (), ChoiceMap.kw(v2=True))
        alg = ImportanceK(target, k_particles=64)
        col = alg.run_smc(jax.random.key(0))
        driver = SMCDriver(n_particles=64, ess_threshold=1.1)  # always resample
        col2 = driver.maybe_resample(jax.random.key(1), col)
        assert jnp.allclose(col2.get_ess(), 64.0, atol=1e-3)
