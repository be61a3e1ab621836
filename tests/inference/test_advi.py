"""Automatic mean-field VI (advi/fit/mean_field_guide) against exact
Gaussian posteriors: the fitted mean matches the posterior mean and the
fitted scale matches the OPTIMAL MEAN-FIELD scale (1/sqrt of the
precision diagonal — which is what KL(q||p) minimization targets, not
the marginal sd)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import genjax_tpu as gx
from genjax_tpu import ChoiceMap
from genjax_tpu.inference import vi


@gx.gen
def conjugate():
    mu = gx.normal(0.0, 1.0) @ "mu"
    _ = gx.normal(mu, 1.0) @ "y"


class TestADVI:
    def test_conjugate_recovers_posterior(self):
        # posterior given y=2: N(1, 1/sqrt(2))
        params, guide, make_target, gnorms = vi.advi(
            jax.random.key(0), conjugate, (), ChoiceMap.kw(y=2.0),
            n_steps=2000,
        )
        assert abs(float(params["mu"]["mu"]) - 1.0) < 0.1
        assert abs(float(jnp.exp(params["mu"]["log_sigma"])) - 0.7071) < 0.1
        # the fitted guide is a sampler over the latents
        _, latents = guide.random_weighted(
            jax.random.key(1), make_target(params)
        )
        assert bool(jnp.isfinite(latents["mu"]))
        assert bool(jnp.isfinite(gnorms).all())

    def test_linear_regression_matches_meanfield_optimum(self):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(40, 2)))
        y = X @ jnp.array([1.0, -1.0]) + 0.3 * jnp.asarray(
            rng.normal(size=(40,))
        )

        @gx.gen
        def linreg(X):
            w = gx.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            _ = gx.mv_normal_diag(X @ w, 0.3 * jnp.ones(40)) @ "y"

        params, _, _, _ = vi.advi(
            jax.random.key(2), linreg, (X,), ChoiceMap.kw(y=y),
            n_steps=4000, optimizer=optax.adam(3e-2),
        )
        prec = jnp.eye(2) + X.T @ X / 0.09
        exact_mean = jnp.linalg.inv(prec) @ (X.T @ y / 0.09)
        mf_sd = 1.0 / jnp.sqrt(jnp.diag(prec))
        assert jnp.allclose(params["w"]["mu"], exact_mean, atol=0.05)
        assert jnp.allclose(
            jnp.exp(params["w"]["log_sigma"]), mf_sd, rtol=0.3
        )

    def test_nested_models_raise_clearly(self):
        @gx.gen
        def inner():
            return gx.normal(0.0, 1.0) @ "u"

        @gx.gen
        def nested():
            z = inner() @ "sub"
            _ = gx.normal(z, 1.0) @ "y"

        with pytest.raises(NotImplementedError, match="flat"):
            vi.advi(jax.random.key(3), nested, (), ChoiceMap.kw(y=1.0))

    def test_discrete_latents_raise_clearly(self):
        """Regression: a Gaussian guide over a Bernoulli latent used to
        run to completion with finite-but-meaningless densities; the
        discovery pass must reject non-floating latents."""

        @gx.gen
        def mixed():
            b = gx.flip(0.3) @ "b"
            _ = gx.normal(jnp.where(b, 1.0, -1.0), 1.0) @ "y"

        with pytest.raises(NotImplementedError, match="real-valued"):
            vi.advi(jax.random.key(5), mixed, (), ChoiceMap.kw(y=0.5))

    def test_rank2_latents_raise_clearly(self):
        with pytest.raises(NotImplementedError, match="rank"):
            vi.mean_field_guide({"m": (2, 3)})

    def test_fit_driver_standalone(self):
        # fit() works with a hand-built guide and any objective factory
        @gx.marginal()
        @gx.gen
        def guide(target):
            vmu, log_vsigma = target.args
            _ = vi.normal_reparam(vmu, jnp.exp(log_vsigma)) @ "mu"

        # conjugate takes no args; wrap to carry the variational params
        wrapped = conjugate.contramap(lambda *a: ())

        def make_target(vmu, log_vsigma):
            return gx.Target(wrapped, (vmu, log_vsigma), ChoiceMap.kw(y=2.0))

        grad = vi.ELBO(guide, make_target)
        (vmu, vls), gnorms = vi.fit(
            jax.random.key(4), grad, (0.0, 0.0), n_steps=1500
        )
        assert abs(float(vmu) - 1.0) < 0.1
        assert gnorms.shape == (1500,)
