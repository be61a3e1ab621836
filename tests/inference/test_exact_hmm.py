"""Discrete HMM / FFBS exactness tests."""

import jax
import jax.numpy as jnp

from genjax_tpu.distributions.discrete_hmm import (
    DiscreteHMM,
    DiscreteHMMConfiguration,
    forward_filter,
    forward_filtering_backward_sampling,
    path_joint_logpdf,
)
from genjax_tpu.inference.exact_testbed import build_test_against_exact_inference


def small_config():
    return DiscreteHMMConfiguration(5, 1, 1, 0.5, 0.5)


class TestForwardFilter:
    def test_data_marginal_matches_brute_force(self):
        config = small_config()
        prior = config.prior_logits()
        trans = config.transition_log_probs()
        obs = config.observation_log_probs()
        observations = jnp.array([0, 2, 4])
        _, log_marginal = forward_filter(prior, trans, obs, observations)

        # brute force: sum over all 5^3 latent paths
        total = -jnp.inf
        for z0 in range(5):
            for z1 in range(5):
                for z2 in range(5):
                    path = jnp.array([z0, z1, z2])
                    lp = path_joint_logpdf(prior, trans, obs, path, observations)
                    total = jnp.logaddexp(total, lp)
        assert jnp.allclose(log_marginal, total, atol=1e-4)

    def test_posterior_normalizes(self):
        config = small_config()
        observations = jnp.array([0, 2])
        # sum_z exp(estimate_logpdf(z)) == 1
        total = -jnp.inf
        for z0 in range(5):
            for z1 in range(5):
                path = jnp.array([z0, z1])
                lp = DiscreteHMM.estimate_logpdf(
                    jax.random.key(0), path, config, observations
                )
                total = jnp.logaddexp(total, lp)
        assert jnp.allclose(jnp.exp(total), 1.0, atol=1e-4)


class TestFFBS:
    def test_samples_match_exact_posterior(self):
        """Empirical FFBS frequencies match exact posterior probabilities."""
        config = small_config()
        observations = jnp.array([0, 1])

        def draw(key):
            _, (samples, _) = forward_filtering_backward_sampling(
                key, config, observations
            )
            return samples

        keys = jax.random.split(jax.random.key(0), 4000)
        paths = jax.vmap(draw)(keys)

        # Check the marginal frequency of z0 == 0 against exact enumeration
        freq = jnp.mean(paths[:, 0] == 0)
        exact = 0.0
        for z1 in range(5):
            path = jnp.array([0, z1])
            exact += jnp.exp(
                DiscreteHMM.estimate_logpdf(jax.random.key(0), path, config, observations)
            )
        assert jnp.allclose(freq, exact, atol=0.03)

    def test_random_weighted_score_is_exact_density(self):
        config = small_config()
        observations = jnp.array([0, 1, 2])
        score, latents = DiscreteHMM.random_weighted(
            jax.random.key(0), config, observations
        )
        lp = DiscreteHMM.estimate_logpdf(
            jax.random.key(1), latents, config, observations
        )
        assert jnp.allclose(score, lp, atol=1e-5)


class TestExactTestbed:
    def test_problem_generator(self):
        generator = build_test_against_exact_inference(4, 5, 1, 1, 0.5, 0.5)
        problem, config = generator(jax.random.key(0))
        assert problem.latent_sequence.shape == (4,)
        assert problem.observation_sequence.shape == (4,)
        assert jnp.isfinite(problem.log_posterior)
        assert jnp.isfinite(problem.log_data_marginal)
        # posterior density <= 0 in log space, and consistency:
        joint_minus_marginal = problem.log_posterior
        assert joint_minus_marginal <= 1e-5
