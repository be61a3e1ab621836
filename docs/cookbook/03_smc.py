"""Cookbook: importance sampling, SIR, the SMC driver, and the bootstrap
particle filter."""

import jax
import jax.numpy as jnp

from genjax_tpu import ChoiceMap, Target, beta, flip, gen
from genjax_tpu.inference.smc import ImportanceK, SMCDriver
from genjax_tpu.models.ssm import run_bootstrap_filter, simulate_ssm_data


@gen
def beta_bernoulli(a, b):
    p = beta(a, b) @ "p"
    v = flip(p) @ "v"
    return v


def main():
    key = jax.random.key(314159)

    # --- SIR (README quickstart) ---
    target = Target(beta_bernoulli, (2.0, 2.0), ChoiceMap.d({"v": True}))
    alg = ImportanceK(target, k_particles=1000)
    keys = jax.random.split(key, 256)
    _, chms = jax.jit(
        jax.vmap(alg.random_weighted, in_axes=(0, None))
    )(keys, target)
    # posterior mean 0.6; MC standard error ~ 0.2/sqrt(256) = 0.0125
    assert jnp.abs(jnp.mean(chms["p"]) - 0.6) < 0.05

    # exact marginal p(v=True) = 0.5
    lml = alg.log_marginal_likelihood_estimate(key)
    assert jnp.abs(jnp.exp(lml) - 0.5) < 0.05

    # --- step-wise SMC driver with adaptive systematic resampling ---
    @gen
    def two_obs():
        z = beta(2.0, 2.0) @ "z"
        _ = flip(z) @ "o1"
        _ = flip(z) @ "o2"

    driver = SMCDriver(n_particles=4096, ess_threshold=0.7)
    col = driver.init(key, Target(two_obs, (), ChoiceMap.kw(o1=True)))
    col = driver.maybe_resample(jax.random.fold_in(key, 1), col)
    col = driver.extend(jax.random.fold_in(key, 2), col, ChoiceMap.kw(o2=True))
    # p(o1=T, o2=T) = E[z^2] = Var + mean^2 = 0.05 + 0.25 = 0.3
    assert jnp.abs(jnp.exp(col.get_log_marginal_likelihood_estimate()) - 0.3) < 0.03

    # --- bootstrap particle filter on a nonlinear SSM ---
    _, ys = simulate_ssm_data(jax.random.key(7), 30)
    lml, z_final = jax.jit(
        lambda k: run_bootstrap_filter(k, ys, n_particles=2048)
    )(jax.random.key(8))
    assert jnp.isfinite(lml)

    print("smc cookbook OK")


if __name__ == "__main__":
    main()
