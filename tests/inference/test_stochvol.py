"""Stochastic volatility model family: PMMH and particle-Gibbs parameter
recovery on simulated data (the canonical PMCMC application)."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.inference.particle_gibbs import ParticleGibbs
from genjax_tpu.models.stochvol import (
    make_sv_filter,
    run_sv_pmmh,
    simulate_sv_data,
    sv_log_prior,
)

TRUE = {
    "phi": jnp.asarray(jnp.arctanh(0.9)),
    "log_sigma": jnp.asarray(jnp.log(0.3)),
    "log_beta": jnp.asarray(jnp.log(0.8)),
}


class TestStochVol:
    def test_pmmh_recovers_parameters(self):
        _, ys = simulate_sv_data(jax.random.key(0), 200, TRUE)
        _, thetas, lmls, accs = jax.jit(
            lambda k: run_sv_pmmh(k, ys, n_particles=256, n_steps=400)
        )(jax.random.key(1))
        assert bool(jnp.isfinite(lmls).all())
        assert 0.1 < float(jnp.mean(accs)) < 0.95
        phis = np.tanh(np.asarray(thetas["phi"])[150:])
        sigmas = np.exp(np.asarray(thetas["log_sigma"])[150:])
        betas = np.exp(np.asarray(thetas["log_beta"])[150:])
        # Posterior sds at T=200 measured ~0.05/0.08/0.10; allow ~3 sds
        # plus estimator noise.
        assert abs(phis.mean() - 0.9) < 0.17, phis.mean()
        assert abs(sigmas.mean() - 0.3) < 0.25, sigmas.mean()
        assert abs(betas.mean() - 0.8) < 0.30, betas.mean()

    def test_particle_gibbs_on_sv(self):
        _, ys = simulate_sv_data(jax.random.key(2), 120, TRUE)
        pg = ParticleGibbs(
            make_sv_filter(128),
            log_prior=sv_log_prior,
            step_scales=jnp.asarray(0.08),
            theta_steps=3,
        )
        theta0 = {
            "phi": jnp.asarray(1.0),
            "log_sigma": jnp.asarray(-1.0),
            "log_beta": jnp.asarray(0.0),
        }
        theta, path, (thetas, accs) = jax.jit(
            lambda k: pg.run(k, theta0, ys, n_sweeps=200)
        )(jax.random.key(3))
        assert path.shape == (120,)
        assert bool(jnp.isfinite(thetas["phi"]).all())
        assert 0.05 < float(jnp.mean(accs)) < 0.98
        phis = np.tanh(np.asarray(thetas["phi"])[80:])
        # looser than PMMH (shorter series, fewer sweeps): the posterior
        # itself has sd ~0.1 at T=120
        assert abs(phis.mean() - 0.9) < 0.3, phis.mean()
