"""MAP + Laplace against closed forms: conjugate normal-normal (exact
mode/evidence/variance) and Bayesian linear regression (exact Gaussian
posterior mean/covariance)."""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as gx
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.map_laplace import laplace_approximation, map_estimate


@gx.gen
def conjugate():
    mu = gx.normal(0.0, 1.0) @ "mu"
    _ = gx.normal(mu, 1.0) @ "obs"


class TestMapLaplaceConjugate:
    def test_exact_mode_evidence_variance(self):
        tr, _ = conjugate.importance(
            jax.random.key(0), ChoiceMap.kw(obs=1.0), ()
        )
        map_tr, hist = map_estimate(jax.random.key(1), tr, Selection.at["mu"])
        assert abs(float(map_tr.get_choices()["mu"]) - 0.5) < 1e-3
        # optimization history is monotone-ish: final beats initial
        assert float(hist[-1]) > float(hist[0])
        lap = laplace_approximation(map_tr, Selection.at["mu"])
        exact_lml = float(gx.normal.logpdf(1.0, 0.0, jnp.sqrt(2.0)))
        assert abs(float(lap.log_marginal) - exact_lml) < 1e-3
        assert abs(float(lap.covariance[0, 0]) - 0.5) < 1e-3

    def test_sampling_matches_covariance(self):
        tr, _ = conjugate.importance(
            jax.random.key(2), ChoiceMap.kw(obs=1.0), ()
        )
        map_tr, _ = map_estimate(jax.random.key(3), tr, Selection.at["mu"])
        lap = laplace_approximation(map_tr, Selection.at["mu"])
        draws = lap.sample(jax.random.key(4), 20000)["mu"]
        assert abs(float(jnp.mean(draws)) - 0.5) < 0.02
        assert abs(float(jnp.var(draws)) - 0.5) < 0.03


class TestMapLaplaceLinearRegression:
    def test_matches_exact_gaussian_posterior(self):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(50, 2)))
        w_true = jnp.array([1.0, -2.0])
        y = X @ w_true + 0.3 * jnp.asarray(rng.normal(size=(50,)))

        @gx.gen
        def linreg(X, y_obs):
            w = gx.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            _ = gx.mv_normal_diag(X @ w, 0.3 * jnp.ones(50)) @ "y"

        tr, _ = linreg.importance(
            jax.random.key(1), ChoiceMap.kw(y=y), (X, y)
        )
        map_tr, _ = map_estimate(
            jax.random.key(2), tr, Selection.at["w"], n_steps=2000
        )
        lap = laplace_approximation(map_tr, Selection.at["w"])
        prec = jnp.eye(2) + X.T @ X / 0.09
        cov = jnp.linalg.inv(prec)
        mean = cov @ (X.T @ y / 0.09)
        assert jnp.allclose(map_tr.get_choices()["w"], mean, atol=1e-3)
        assert jnp.allclose(lap.covariance, cov, atol=1e-5)

    def test_jit_and_vmap_restarts(self):
        # parallel restarts: vmap map_estimate over different inits
        tr, _ = conjugate.importance(
            jax.random.key(5), ChoiceMap.kw(obs=1.0), ()
        )

        def from_init(v, k):
            t, _, _, _ = gx.Update(ChoiceMap.kw(mu=v)).edit(
                k, tr, gx.Diff.no_change(())
            )
            mt, _ = map_estimate(k, t, Selection.at["mu"], n_steps=300)
            return mt.get_choices()["mu"]

        inits = jnp.array([-3.0, 0.0, 4.0])
        keys = jax.random.split(jax.random.key(6), 3)
        modes = jax.jit(jax.vmap(from_init))(inits, keys)
        assert jnp.allclose(modes, 0.5, atol=1e-2)
