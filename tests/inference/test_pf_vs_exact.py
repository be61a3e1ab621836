"""Bootstrap particle filter validated against the exact HMM testbed:
the PF's LML estimate must match the FFBS/forward-algorithm exact data
marginal."""

import jax
import jax.numpy as jnp

from genjax_tpu import categorical, gen
from genjax_tpu.distributions.discrete_hmm import (
    DiscreteHMM,
    DiscreteHMMConfiguration,
)
from genjax_tpu.inference.particle_filter import BootstrapFilter


def build_hmm_pf(config: DiscreteHMMConfiguration, n_particles: int):
    prior = config.prior_logits()
    trans = config.transition_log_probs()
    obs = config.observation_log_probs()

    @gen
    def init_model():
        z = categorical(logits=prior) @ "z"
        _ = categorical(logits=obs[z]) @ "y"
        return z

    @gen
    def step_model(z_prev, _t):
        z = categorical(logits=trans[z_prev]) @ "z"
        _ = categorical(logits=obs[z]) @ "y"
        return z

    return BootstrapFilter(step_model, init_model, n_particles, obs_addr="y")


class TestPFAgainstExactHMM:
    def test_lml_matches_exact_marginal(self):
        config = DiscreteHMMConfiguration(10, 2, 2, 0.5, 0.5)
        observations = jnp.array([0, 3, 7, 2, 9, 9, 1, 4])
        exact = DiscreteHMM.data_logpdf(config, observations)

        pf = build_hmm_pf(config, n_particles=4096)
        keys = jax.random.split(jax.random.key(0), 32)
        lmls = jax.vmap(lambda k: pf.run(k, observations)[0])(keys)
        # PF LML is unbiased in probability space; with 4096 particles the
        # log-space bias is tiny.
        assert jnp.allclose(jnp.mean(lmls), exact, atol=0.05), (
            f"PF {jnp.mean(lmls)} vs exact {exact}"
        )

    def test_all_resamplers_agree(self):
        config = DiscreteHMMConfiguration(8, 1, 1, 0.4, 0.4)
        observations = jnp.array([0, 2, 5, 7, 1])
        exact = DiscreteHMM.data_logpdf(config, observations)
        for method in ["systematic", "multinomial", "stratified", "residual"]:
            pf = build_hmm_pf(config, n_particles=2048)
            pf = BootstrapFilter(
                pf.step_model, pf.init_model, 2048, obs_addr="y", resampling=method
            )
            keys = jax.random.split(jax.random.key(1), 16)
            lmls = jax.vmap(lambda k: pf.run(k, observations)[0])(keys)
            assert jnp.allclose(jnp.mean(lmls), exact, atol=0.1), method
