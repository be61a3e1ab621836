"""`tfp_distribution` compat factory (reference
tensorflow_probability/__init__.py:35): a duck-typed distribution object
(.sample(seed=)/.log_prob) becomes a full generative function."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, tfp_distribution


class ShiftedExponential:
    """Hand-rolled TFP-style distribution: loc + Exp(rate)."""

    def __init__(self, loc, rate):
        self.loc = loc
        self.rate = rate

    def sample(self, seed=None, sample_shape=()):
        e = jax.random.exponential(seed, shape=sample_shape)
        return self.loc + e / self.rate

    def log_prob(self, v):
        z = v - self.loc
        return jnp.where(
            z >= 0, jnp.log(self.rate) - self.rate * z, -jnp.inf
        )


shifted_exp = tfp_distribution(ShiftedExponential, name="shifted_exponential")


class TestTfpShim:
    def test_simulate_and_score_consistent(self):
        tr = shifted_exp.simulate(jax.random.key(0), (1.0, 2.0))
        v = tr.get_retval()
        assert v >= 1.0
        expected = jnp.log(2.0) - 2.0 * (v - 1.0)
        assert jnp.allclose(tr.get_score(), expected, atol=1e-6)

    def test_inside_gen_program(self):
        @g.gen
        def model():
            x = shifted_exp(0.0, 1.0) @ "x"
            return g.normal(x, 1.0) @ "y"

        sc, _ = model.assess(ChoiceMap.d({"x": 0.5, "y": 1.0}), ())
        expected = (0.0 - 0.5) + (
            -0.5 * 0.25 - 0.5 * jnp.log(2 * jnp.pi)
        )
        assert jnp.allclose(sc, expected, atol=1e-5)

    def test_sample_statistics(self):
        keys = jax.random.split(jax.random.key(1), 4000)
        vs = jax.vmap(lambda k: shifted_exp.simulate(k, (1.0, 2.0)).get_retval())(
            keys
        )
        assert jnp.abs(jnp.mean(vs) - 1.5) < 0.05  # E = loc + 1/rate

    def test_importance_weight(self):
        tr, w = shifted_exp.importance(
            jax.random.key(0), ChoiceMap.choice(2.0), (1.0, 2.0)
        )
        assert jnp.allclose(w, jnp.log(2.0) - 2.0, atol=1e-6)
