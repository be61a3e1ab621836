"""`add_cost` accumulates differentiable cost terms into expectations."""

import jax
import jax.numpy as jnp

from genjax_tpu.adev import add_cost, expectation, flip_enum


class TestAddCost:
    def test_cost_term_contributes_to_gradient(self):
        @expectation
        def loss(p):
            add_cost(3.0 * p)
            b = flip_enum(p)
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        # E = 3p + p = 4p -> dE/dp = 4 exactly
        (grad,) = loss.grad_estimate(jax.random.key(0), (0.25,))
        assert jnp.allclose(grad, 4.0)

    def test_multiple_costs(self):
        @expectation
        def loss(p):
            add_cost(p)
            add_cost(p * p)
            return 0.0 * p

        # E = p + p^2 -> dE/dp = 1 + 2p
        (grad,) = loss.grad_estimate(jax.random.key(0), (0.5,))
        assert jnp.allclose(grad, 2.0)

    def test_value(self):
        @expectation
        def loss(p):
            add_cost(2.0 * p)
            return p

        v = loss.estimate(jax.random.key(0), (0.5,))
        assert jnp.allclose(v, 1.5)
