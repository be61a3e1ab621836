"""Exact-inference testbed: generate HMM inference problems with exact
log posteriors / data marginals as ground-truth oracles for validating
approximate inference.

Capability parity with reference `_src/inference/exact_testbed.py:45-91`.
"""

import jax
import jax.numpy as jnp

from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import FloatArray, IntArray, PRNGKey
from genjax_tpu.distributions.discrete_hmm import (
    DiscreteHMM,
    DiscreteHMMConfiguration,
)
from genjax_tpu.distributions.library import categorical
from genjax_tpu.lang.static import gen


@Pytree.dataclass
class DiscreteHMMInferenceProblem(Pytree):
    initial_state: IntArray
    log_posterior: FloatArray
    log_data_marginal: FloatArray
    latent_sequence: IntArray
    observation_sequence: IntArray


def build_hmm_chain_model(config: DiscreteHMMConfiguration, max_length: int):
    """The generative HMM as a `@gen` scan program (addresses "z", "x" per
    step)."""
    from genjax_tpu.combinators.scan import scan

    @scan(n=max_length)
    @gen
    def markov_chain(state, _x):
        transition = config.transition_log_probs()
        observation = config.observation_log_probs()
        z = categorical(logits=transition[state, :]) @ "z"
        _ = categorical(logits=observation[z, :]) @ "x"
        return z, None

    return markov_chain


def build_test_against_exact_inference(
    max_length: int,
    state_space_size: int,
    transition_distance_truncation: int,
    observation_distance_truncation: int,
    transition_variance: float,
    observation_variance: float,
):
    """Return a generator of `DiscreteHMMInferenceProblem`s: simulated
    latent/observation sequences paired with their exact posterior density
    and data marginal."""
    config = DiscreteHMMConfiguration(
        state_space_size,
        transition_distance_truncation,
        observation_distance_truncation,
        transition_variance,
        observation_variance,
    )
    markov_chain = build_hmm_chain_model(config, max_length)

    def inference_test_generator(key: PRNGKey) -> DiscreteHMMInferenceProblem:
        key, sub_key = jax.random.split(key)
        initial_state = jax.random.categorical(
            sub_key, jnp.zeros(config.linear_grid_dim)
        )
        tr = markov_chain.simulate(sub_key, (initial_state, None))
        chm = tr.get_choices()
        # Scan traces store per-step addresses as dense arrays: the bare
        # "z"/"x" addresses expose the whole sequence.
        latents = chm["z"]
        observations = chm["x"]
        log_data_marginal = DiscreteHMM.data_logpdf(config, observations)
        log_posterior = DiscreteHMM.estimate_logpdf(
            key, latents, config, observations
        )
        return DiscreteHMMInferenceProblem(
            initial_state,
            log_posterior,
            log_data_marginal,
            latents,
            observations,
        ), config

    return inference_test_generator
