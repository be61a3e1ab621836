"""Hierarchical partial pooling (eight schools) vs the quadrature oracle.

Three layers of validation:
1. the 2-D oracle is internally consistent (grid refinement) and agrees
   with a brute-force 3-D quadrature built directly on the MODEL's own
   `assess` density (single-school reduction) — tying the closed-form
   marginalization algebra to the actual model code;
2. the centered and non-centered parameterizations define the same
   joint (exact change-of-variables identity on `assess`);
3. gradient-based posterior sampling (ChEES) recovers the oracle's
   posterior moments for every latent, through the funnel.
"""

import jax
import jax.numpy as jnp
import pytest

from genjax_tpu import ChoiceMap
from genjax_tpu.models.hierarchical import (
    EIGHT_SCHOOLS_SIGMA,
    EIGHT_SCHOOLS_Y,
    eight_schools,
    eight_schools_centered,
    eight_schools_quadrature,
    run_eight_schools,
)


class TestOracle:
    def test_grid_refinement_stable(self):
        a = eight_schools_quadrature(
            EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA, n_mu=301, n_lt=301
        )
        b = eight_schools_quadrature(
            EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA, n_mu=601, n_lt=601
        )
        assert jnp.abs(a.mu_mean - b.mu_mean) < 1e-3
        assert jnp.abs(a.tau_mean - b.tau_mean) < 1e-3
        assert jnp.abs(a.log_evidence - b.log_evidence) < 1e-3
        assert jnp.max(jnp.abs(a.theta_mean - b.theta_mean)) < 1e-3

    def test_oracle_matches_brute_force_on_model_density(self):
        # Single-school reduction: 3-D quadrature over (mu, log_tau, z)
        # using the NON-CENTERED model's assess as the integrand. (The
        # centered parameterization is numerically unusable as a
        # brute-force integrand: at small tau the theta spike falls
        # between grid points; the unit-scale z axis has no such
        # pathology at any tau.) E[tau] is excluded — with a single
        # school the half-Cauchy tail survives the likelihood and the
        # posterior tau mean diverges; E[log_tau] converges.
        y1 = EIGHT_SCHOOLS_Y[:1]
        s1 = EIGHT_SCHOOLS_SIGMA[:1]
        mus = jnp.linspace(-40.0, 40.0, 161)
        lts = jnp.linspace(-12.0, 7.0, 161)
        zs = jnp.linspace(-8.0, 8.0, 161)
        mg, lg, zg = jnp.meshgrid(mus, lts, zs, indexing="ij")
        flat = (mg.ravel(), lg.ravel(), zg.ravel())

        @jax.jit
        def logp(m, lt, z):
            chm = ChoiceMap.kw(mu=m, log_tau=lt, z=z[None], ys=y1)
            s, _ = eight_schools.assess(chm, (s1,))
            return s

        lp = jax.vmap(logp)(*flat)
        vol = (mus[1] - mus[0]) * (lts[1] - lts[0]) * (zs[1] - zs[0])
        log_z = jax.scipy.special.logsumexp(lp) + jnp.log(vol)
        w = jnp.exp(lp - jax.scipy.special.logsumexp(lp))
        bf_mu = jnp.sum(w * flat[0])
        bf_lt = jnp.sum(w * flat[1])
        bf_th = jnp.sum(w * (flat[0] + jnp.exp(flat[1]) * flat[2]))

        o = eight_schools_quadrature(y1, s1, n_mu=801, n_lt=801)
        assert jnp.abs(log_z - o.log_evidence) < 2e-2
        assert jnp.abs(bf_mu - o.mu_mean) < 5e-2
        assert jnp.abs(bf_lt - o.log_tau_mean) < 5e-2
        assert jnp.abs(bf_th - o.theta_mean[0]) < 5e-2

    def test_parameterizations_same_joint(self):
        # Change of variables z = (theta - mu) / tau: the non-centered
        # density equals the centered one plus the log-Jacobian J * lt.
        mu, lt = jnp.float32(3.0), jnp.float32(0.7)
        tau = jnp.exp(lt)
        j = EIGHT_SCHOOLS_Y.shape[0]
        theta = jnp.linspace(-5.0, 20.0, j)
        z = (theta - mu) / tau
        s_c, _ = eight_schools_centered.assess(
            ChoiceMap.kw(mu=mu, log_tau=lt, theta=theta, ys=EIGHT_SCHOOLS_Y),
            (EIGHT_SCHOOLS_SIGMA,),
        )
        s_nc, _ = eight_schools.assess(
            ChoiceMap.kw(mu=mu, log_tau=lt, z=z, ys=EIGHT_SCHOOLS_Y),
            (EIGHT_SCHOOLS_SIGMA,),
        )
        assert jnp.allclose(s_nc, s_c + j * lt, atol=1e-4)


class TestSampling:
    @pytest.mark.parametrize("algorithm", ["chees"])
    def test_recovers_oracle_moments(self, algorithm):
        oracle = eight_schools_quadrature(
            EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA
        )
        out, theta = run_eight_schools(
            jax.random.key(0),
            algorithm=algorithm,
            n_chains=32,
            n_warmup=300,
            n_samples=400,
        )
        mu = out.samples["mu"]
        tau = jnp.exp(out.samples["log_tau"])
        n_eff = 32 * 400 / 20.0  # conservative autocorrelation discount
        for got, mean, var, label in [
            (jnp.mean(mu), oracle.mu_mean, oracle.mu_var, "mu"),
            (jnp.mean(tau), oracle.tau_mean, oracle.tau_var, "tau"),
        ]:
            se = jnp.sqrt(var / n_eff)
            assert jnp.abs(got - mean) < 6 * se + 0.05, (
                f"{label}: {got} vs oracle {mean} (6se={6 * se})"
            )
        th_err = jnp.abs(jnp.mean(theta, axis=(0, 1)) - oracle.theta_mean)
        th_se = jnp.sqrt(oracle.theta_var / n_eff)
        assert jnp.all(th_err < 6 * th_se + 0.05), (
            f"theta means off: {th_err} vs 6se {6 * th_se}"
        )
