"""Benchmark config 1: beta-bernoulli SIR (the reference README
quickstart, `README.md:84-120`)."""

import jax
import jax.numpy as jnp

from genjax_tpu import ChoiceMap, beta, flip, gen
from genjax_tpu.inference.smc import ImportanceK
from genjax_tpu.inference.sp import Target


@gen
def beta_bernoulli(alpha, beta_param):
    p = beta(alpha, beta_param) @ "p"
    v = flip(p) @ "v"
    return v


def run_sir(key, obs: bool, k_particles: int = 50, n_trials: int = 50):
    """SIR posterior-mean estimate of `p`, vectorized over trials."""
    target = Target(beta_bernoulli, (2.0, 2.0), ChoiceMap.d({"v": obs}))
    alg = ImportanceK(target, k_particles=k_particles)
    sub_keys = jax.random.split(key, n_trials)
    _, chms = jax.vmap(alg.random_weighted, in_axes=(0, None))(sub_keys, target)
    return jnp.mean(chms["p"])
