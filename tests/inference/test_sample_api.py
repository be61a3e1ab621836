"""The one-call sampling API: all five algorithms recover the conjugate
posterior with healthy diagnostics, selections default to the
unconstrained addresses, and multivariate latents round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as gx
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.sample import sample_posterior

POST_MEAN, POST_VAR = 0.5, 0.5


@gx.gen
def conjugate():
    mu = gx.normal(0.0, 1.0) @ "mu"
    _ = gx.normal(mu, 1.0) @ "obs"


class TestSamplePosterior:
    @pytest.mark.parametrize("algorithm", ["chees", "hmc", "mala", "nuts", "elliptical"])
    def test_conjugate_exactness_and_diagnostics(self, algorithm):
        out = sample_posterior(
            jax.random.key(0),
            conjugate,
            ChoiceMap.kw(obs=1.0),
            algorithm=algorithm,
            n_chains=64,
            n_warmup=100,
            n_samples=200,
            thin_burn=50,
            L=5,
        )
        mus = out.samples["mu"]
        assert mus.shape == (64, 150)
        se = float(jnp.sqrt(POST_VAR / 64))
        assert abs(float(jnp.mean(mus)) - POST_MEAN) < 6 * se
        assert abs(float(jnp.var(mus)) - POST_VAR) < 0.15
        assert float(out.rhat["mu"]) < 1.1
        assert float(out.ess["mu"]) > 200
        assert out.flat()["mu"].shape == (64 * 150,)

    def test_explicit_selection_and_multivariate(self):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(40, 2)))
        y = X @ jnp.array([1.0, -1.0]) + 0.3 * jnp.asarray(
            rng.normal(size=(40,))
        )

        @gx.gen
        def linreg(X):
            w = gx.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            _ = gx.mv_normal_diag(X @ w, 0.3 * jnp.ones(40)) @ "y"

        out = sample_posterior(
            jax.random.key(1),
            linreg,
            ChoiceMap.kw(y=y),
            (X,),
            selection=Selection.at["w"],
            algorithm="chees",
            n_chains=32,
            n_warmup=100,
            n_samples=150,
            thin_burn=50,
        )
        assert out.samples["w"].shape == (32, 100, 2)
        # exact Gaussian posterior mean
        prec = jnp.eye(2) + X.T @ X / 0.09
        mean = jnp.linalg.inv(prec) @ (X.T @ y / 0.09)
        est = jnp.mean(out.flat()["w"], axis=0)
        assert jnp.allclose(est, mean, atol=0.05), (est, mean)
        assert bool(jnp.all(out.rhat["w"] < 1.15))

    def test_posterior_predictive_matches_closed_form(self):
        from genjax_tpu.inference.sample import posterior_predictive

        out = sample_posterior(
            jax.random.key(3),
            conjugate,
            ChoiceMap.kw(obs=1.0),
            algorithm="hmc",
            n_chains=64,
            n_warmup=80,
            n_samples=150,
            thin_burn=50,
            L=5,
        )
        pred = posterior_predictive(
            jax.random.key(4), conjugate, (), out.flat()
        )
        ys = pred["obs"]
        # predictive of a new obs: N(post_mean, post_var + 1) = N(0.5, 1.5)
        n = ys.shape[0]
        assert abs(float(jnp.mean(ys)) - 0.5) < 6 * float(
            jnp.sqrt(1.5 / 64)  # chains are the independent unit
        )
        assert abs(float(jnp.var(ys)) - 1.5) < 0.2

    def test_init_overrides_start_not_selection(self):
        # `init` pins starting values (ChoiceMap or key->ChoiceMap); the
        # overridden latent is still sampled by the kernel, so the
        # posterior is untouched — only the starting point moved.
        for init in (
            ChoiceMap.kw(mu=3.0),
            lambda k: ChoiceMap.kw(
                mu=jax.random.uniform(k, minval=-2.0, maxval=2.0)
            ),
        ):
            out = sample_posterior(
                jax.random.key(1),
                conjugate,
                ChoiceMap.kw(obs=1.0),
                algorithm="hmc",
                n_chains=64,
                n_warmup=100,
                n_samples=150,
                L=5,
                init=init,
            )
            mus = out.samples["mu"]
            se = float(jnp.sqrt(POST_VAR / 64))
            assert abs(float(jnp.mean(mus)) - POST_MEAN) < 6 * se
            # it moved: the kernel did not hold mu at its init value
            assert float(jnp.var(mus)) > 0.2

    def test_unknown_algorithm_raises(self):
        with pytest.raises(ValueError, match="unknown algorithm"):
            sample_posterior(
                jax.random.key(2),
                conjugate,
                ChoiceMap.kw(obs=1.0),
                algorithm="slice-of-life",
            )
