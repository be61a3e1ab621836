"""GP model family: kernel sanity, exact-density identities, and
elliptical-slice sampling against the conjugate GP-regression oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.models.gp import (
    gp_posterior,
    make_gp_regression,
    matern32_kernel,
    rbf_kernel,
    run_gp_ess,
)

XS = jnp.linspace(0.0, 3.0, 12)
_rng = np.random.default_rng(0)
YS = jnp.asarray(
    np.sin(2 * np.asarray(XS)) + 0.3 * _rng.standard_normal(12),
    dtype=jnp.float32,
)


class TestKernels:
    def test_psd_and_diagonal(self):
        for kern in (rbf_kernel, matern32_kernel):
            K = kern(XS, XS, lengthscale=0.7, variance=2.0)
            assert jnp.allclose(K, K.T, atol=1e-6)
            assert jnp.allclose(jnp.diag(K), 2.0, atol=1e-5)
            evals = jnp.linalg.eigvalsh(K)
            assert float(evals.min()) > -1e-4

    def test_2d_inputs(self):
        xs2 = jnp.stack([XS, XS**2], axis=-1)
        K = rbf_kernel(xs2, xs2)
        assert K.shape == (12, 12)
        assert jnp.allclose(jnp.diag(K), 1.0, atol=1e-6)


class TestExactDensity:
    def test_model_score_matches_hand_computed_joint(self):
        # Well-separated points + short lengthscale keep the Gram matrix
        # well-conditioned, so the float32 hand computation is meaningful.
        xs = jnp.linspace(0.0, 3.0, 8)
        model = make_gp_regression()
        args = (xs, 0.3, 0.5, 1.0)
        tr = model.simulate(jax.random.key(0), args)
        f = tr.get_choices()["f"]
        y = tr.get_choices()["y"]
        n = xs.shape[0]
        K = rbf_kernel(xs, xs, lengthscale=0.5) + 1e-5 * jnp.eye(n)
        sign, logdet = jnp.linalg.slogdet(K)
        lp_f = -0.5 * f @ jnp.linalg.solve(K, f) - 0.5 * (
            logdet + n * jnp.log(2.0 * jnp.pi)
        )
        lp_y = jnp.sum(
            -0.5 * ((y - f) / 0.3) ** 2
            - jnp.log(0.3)
            - 0.5 * jnp.log(2.0 * jnp.pi)
        )
        assert jnp.allclose(tr.get_score(), lp_f + lp_y, atol=1e-3)

    def test_gp_posterior_matches_joint_gaussian_conditioning(self):
        """gp_posterior's Cholesky route must equal brute-force
        conditioning of the joint Gaussian [f; y]."""
        mean, cov, lml = gp_posterior(XS, YS, 0.3)
        K = rbf_kernel(XS, XS)
        S = K + 0.09 * jnp.eye(12)
        mean_bf = K @ jnp.linalg.solve(S, YS)
        cov_bf = K - K @ jnp.linalg.solve(S, K)
        assert jnp.allclose(mean, mean_bf, atol=1e-4)
        assert jnp.allclose(cov, cov_bf, atol=1e-4)
        # LML against scipy-style direct multivariate normal logpdf
        sign, logdet = jnp.linalg.slogdet(S)
        lml_bf = -0.5 * YS @ jnp.linalg.solve(S, YS) - 0.5 * (
            logdet + 12 * jnp.log(2.0 * jnp.pi)
        )
        assert jnp.allclose(lml, lml_bf, atol=1e-4)


class TestEllipticalSliceGP:
    def test_ess_recovers_exact_posterior(self):
        """Tuning-free ESS over the CORRELATED 12-dim latent matches
        the conjugate posterior mean and marginal sds."""
        mean, cov, _ = gp_posterior(XS, YS, 0.3)
        fs = jax.jit(lambda k: run_gp_ess(k, XS, YS, n_steps=4000))(
            jax.random.key(0)
        )
        s = fs[1000:]
        assert float(jnp.max(jnp.abs(jnp.mean(s, 0) - mean))) < 0.08
        assert (
            float(jnp.max(jnp.abs(jnp.std(s, 0) - jnp.sqrt(jnp.diag(cov)))))
            < 0.05
        )
