"""Cookbook: MAP estimation and the Laplace approximation.

The fast deterministic path for continuous latents: optimize the log
joint over a Selection, then read a Gaussian posterior (and an evidence
estimate) off the curvature at the mode. Exact when the joint is
Gaussian in the selected values — which also makes it the natural
initializer and sanity oracle for the MCMC and VI machinery.
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Selection, gen, mv_normal_diag
from genjax_tpu.inference.map_laplace import laplace_approximation, map_estimate


def main():
    # Bayesian linear regression: the posterior is exactly Gaussian, so
    # MAP+Laplace IS the posterior.
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(80, 3)))
    w_true = jnp.array([1.0, -2.0, 0.5])
    y = X @ w_true + 0.25 * jnp.asarray(rng.normal(size=(80,)))

    @gen
    def linreg(X, y_obs):
        w = mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
        _ = mv_normal_diag(X @ w, 0.25 * jnp.ones(80)) @ "y"

    tr, _ = linreg.importance(jax.random.key(0), C.kw(y=y), (X, y))
    map_tr, history = map_estimate(
        jax.random.key(1), tr, Selection.at["w"], n_steps=2000
    )
    lap = laplace_approximation(map_tr, Selection.at["w"])

    # closed form: precision = I + X^T X / sigma^2
    prec = jnp.eye(3) + X.T @ X / 0.0625
    cov = jnp.linalg.inv(prec)
    mean = cov @ (X.T @ y / 0.0625)
    assert jnp.allclose(map_tr.get_choices()["w"], mean, atol=1e-3)
    assert jnp.allclose(lap.covariance, cov, atol=1e-5)

    # the approximation is a sampler too — e.g. for posterior predictive
    draws = lap.sample(jax.random.key(2), 4096)["w"]
    assert jnp.allclose(jnp.mean(draws, axis=0), mean, atol=0.05)

    # evidence estimate (exact here): model comparison for free
    assert bool(jnp.isfinite(lap.log_marginal))

    print("map/laplace cookbook OK")


if __name__ == "__main__":
    main()
