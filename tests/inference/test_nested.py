"""Nested sampling: evidence against closed-form and quadrature
oracles, posterior reuse of the dead points, and multimodal coverage."""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.nested import NestedSampler

D = 3
Y = jnp.array([1.0, -0.5, 2.0])


@g.gen
def conjugate_model():
    x = g.normal(jnp.zeros(D), 1.0) @ "x"
    _ = g.normal(x, 0.5) @ "y"


class TestConjugateEvidence:
    def _sampler(self):
        return NestedSampler(
            conjugate_model,
            (),
            ChoiceMap.kw(y=Y),
            Selection.at["x"],
            n_live=400,
            n_iters=2400,
            n_mcmc=20,
            step_scale=0.4,
        )

    def test_evidence_matches_exact(self):
        exact = float(jnp.sum(g.normal.logpdf(Y, 0.0, jnp.sqrt(1.25))))
        out = jax.jit(self._sampler().run)(jax.random.key(0))
        assert abs(float(out["lml"]) - exact) < 0.3
        # healthy constrained walk and bounded truncation
        assert 0.15 < float(out["accept_rate"]) < 0.9
        assert float(out["remainder_frac"]) < 0.5

    def test_dead_points_give_posterior_moments(self):
        out = jax.jit(self._sampler().run)(jax.random.key(1))
        w = jax.nn.softmax(out["log_post_weights"])
        pm = jnp.sum(w[:, None] * out["dead_choices"]["x"], 0)
        assert jnp.max(jnp.abs(pm - 0.8 * Y)) < 0.12  # exact: 0.8 y


@g.gen
def bimodal_model():
    x = g.normal(0.0, 1.0) @ "x"
    _ = g.normal(x * x, 0.5) @ "y"


class TestBimodal:
    """y ~ N(x^2, 0.5) with y = 2.25: the posterior over x has symmetric
    modes near +-1.5; the evidence oracle is 1-D quadrature."""

    def test_evidence_and_both_modes(self):
        y_obs = 2.25
        grid = np.linspace(-6, 6, 20001)
        integ = np.trapezoid(
            np.exp(
                -0.5 * grid**2
                - 0.5 * ((y_obs - grid**2) / 0.5) ** 2
            )
            / (2 * np.pi * 0.5),
            grid,
        )
        exact = float(np.log(integ))
        ns = NestedSampler(
            bimodal_model,
            (),
            ChoiceMap.kw(y=y_obs),
            Selection.at["x"],
            n_live=400,
            n_iters=2000,
            n_mcmc=25,
            step_scale=0.6,
        )
        out = jax.jit(ns.run)(jax.random.key(0))
        assert abs(float(out["lml"]) - exact) < 0.3
        # both posterior modes survive in the weighted dead points
        w = jax.nn.softmax(out["log_post_weights"])
        xs = out["dead_choices"]["x"]
        mass_pos = float(jnp.sum(w * (xs > 0)))
        assert 0.2 < mass_pos < 0.8  # symmetric modes -> ~0.5 each
