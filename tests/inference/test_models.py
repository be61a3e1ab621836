"""Statistical tests for the benchmark model zoo (BASELINE.md configs)."""

import jax
import jax.numpy as jnp

from genjax_tpu.models.beta_bernoulli import run_sir
from genjax_tpu.models.logreg import (
    run_hmc_chains,
    run_mala_chains,
    simulate_logreg_data,
)
from genjax_tpu.models.polyreg import run_is_mh
from genjax_tpu.models.ssm import run_bootstrap_filter, simulate_ssm_data


class TestBetaBernoulli:
    def test_sir_posterior_means(self):
        p_true = run_sir(jax.random.key(0), True, k_particles=200, n_trials=400)
        p_false = run_sir(jax.random.key(1), False, k_particles=200, n_trials=400)
        assert jnp.abs(p_true - 0.6) < 0.03
        assert jnp.abs(p_false - 0.4) < 0.03


class TestPolyReg:
    def test_coefficient_recovery(self):
        xs = jnp.linspace(-1, 1, 30)
        true_c = jnp.array([0.5, -1.0, 2.0])
        design = jnp.stack([jnp.ones_like(xs), xs, xs**2], -1)
        ys = design @ true_c
        lml, coeffs = jax.jit(
            lambda k: run_is_mh(k, xs, ys, n_particles=512, n_rejuvenation=100)
        )(jax.random.key(0))
        post_mean = jnp.mean(coeffs, axis=0)
        assert jnp.allclose(post_mean, true_c, atol=0.25)
        assert jnp.isfinite(lml)


class TestSSM:
    def test_filter_tracks_latents(self):
        zs, ys = simulate_ssm_data(jax.random.key(1), 40)
        lml, z_final = jax.jit(
            lambda k: run_bootstrap_filter(k, ys, n_particles=4096)
        )(jax.random.key(2))
        # final-state particle mean within a few obs-noise units of truth
        assert jnp.abs(jnp.mean(z_final) - zs[-1]) < 1.0
        assert jnp.isfinite(lml)


class TestLogReg:
    def test_hmc_recovers_map(self):
        X, ys, w_true = simulate_logreg_data(jax.random.key(3), 400, 4)
        # ground truth: the posterior mode (prior + likelihood), found by
        # direct gradient ascent
        yf = ys.astype(jnp.float32)

        def logpost(w):
            logits = X @ w
            return (
                -0.5 * jnp.sum(w**2)
                + jnp.sum(
                    yf * -jax.nn.softplus(-logits)
                    + (1 - yf) * -jax.nn.softplus(logits)
                )
            )

        ascend = jax.jit(lambda w: w + 1e-3 * jax.grad(logpost)(w))
        w_map = jnp.zeros(4)
        for _ in range(2000):
            w_map = ascend(w_map)
        ws, accs = jax.jit(
            lambda k: run_hmc_chains(
                k, X, ys, n_chains=64, n_steps=150, eps=0.05, L=8
            )
        )(jax.random.key(4))
        post_mean = jnp.mean(ws, axis=0)
        assert jnp.allclose(post_mean, w_map, atol=0.25)
        assert jnp.mean(accs) > 0.5

    def test_mala_runs(self):
        X, ys, w_true = simulate_logreg_data(jax.random.key(5), 100, 3)
        ws, accs = jax.jit(
            lambda k: run_mala_chains(k, X, ys, n_chains=32, n_steps=100, eps=0.005)
        )(jax.random.key(6))
        assert jnp.all(jnp.isfinite(ws))
        assert jnp.mean(accs) > 0.3
