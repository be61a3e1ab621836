"""ADEV gradient-estimator tests against hand-derived exact derivatives
(parity: reference tests/adev/test_adev.py idioms)."""

import jax
import jax.numpy as jnp

from genjax_tpu.adev import (
    Dual,
    add_cost,
    baseline,
    beta_implicit,
    categorical_enum_parallel,
    expectation,
    flip_enum,
    flip_enum_parallel,
    flip_reinforce,
    normal_reinforce,
    normal_reparam,
)


class TestEnumeration:
    def test_flip_enum_exact_gradient(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        # E = p -> dE/dp = 1 exactly, for any key
        for seed in range(3):
            (grad,) = loss.grad_estimate(jax.random.key(seed), (0.3,))
            assert jnp.allclose(grad, 1.0)

    def test_flip_enum_weighted(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            return jax.lax.cond(b, lambda: 3.0, lambda: -1.0)

        # E = 3p - (1-p) -> dE/dp = 4
        (grad,) = loss.grad_estimate(jax.random.key(0), (0.5,))
        assert jnp.allclose(grad, 4.0)

    def test_flip_enum_nonlinear_continuation(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            v = jax.lax.cond(b, lambda: 1.0, lambda: 0.0)
            return v * p  # E = p^2 -> dE/dp = 2p

        (grad,) = loss.grad_estimate(jax.random.key(0), (0.4,))
        assert jnp.allclose(grad, 0.8, atol=1e-5)

    def test_flip_enum_parallel(self):
        @expectation
        def loss(p):
            b = flip_enum_parallel(p)
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        (grad,) = loss.grad_estimate(jax.random.key(0), (0.3,))
        assert jnp.allclose(grad, 1.0)

    def test_categorical_enum(self):
        @expectation
        def loss(probs):
            idx = categorical_enum_parallel(probs)
            vals = jnp.array([0.0, 1.0, 4.0])
            return vals[idx]

        probs = jnp.array([0.2, 0.3, 0.5])
        (grad,) = loss.grad_estimate(jax.random.key(0), (probs,))
        # `probs` are (unnormalized) probabilities — the sampler draws from
        # probs/sum(probs), so the exact objective is the
        # normalized-probability expectation.
        exact = jax.grad(
            lambda p: jnp.sum(p / jnp.sum(p) * jnp.array([0.0, 1.0, 4.0]))
        )(probs)
        assert jnp.allclose(grad, exact, atol=1e-5)

    def test_categorical_enum_matches_sampler_semantics(self):
        """The enumeration weights must agree with the sampler's
        distribution: estimate E[v] by brute-force sampling and compare to
        the strategy's exact primal."""
        probs = jnp.array([0.1, 0.6, 0.3])
        vals = jnp.array([0.0, 1.0, 4.0])

        @expectation
        def loss(probs):
            idx = categorical_enum_parallel(probs)
            return vals[idx]

        primal = loss.estimate(jax.random.key(0), (probs,))
        exact = jnp.sum(probs / jnp.sum(probs) * vals)
        assert jnp.allclose(primal, exact, atol=1e-6)


class TestContinuous:
    def test_reparam_unbiased(self):
        @expectation
        def loss(mu):
            x = normal_reparam(mu, 1.0)
            return jnp.square(x - 2.0)

        # dE/dmu = 2(mu - 2) = -3 at mu=0.5
        keys = jax.random.split(jax.random.key(0), 4000)
        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.5,))[0])(keys)
        assert jnp.allclose(jnp.mean(grads), -3.0, atol=0.1)

    def test_reinforce_unbiased(self):
        @expectation
        def loss(mu):
            x = normal_reinforce(mu, 1.0)
            return jnp.square(x - 2.0)

        keys = jax.random.split(jax.random.key(1), 8000)
        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.5,))[0])(keys)
        assert jnp.allclose(jnp.mean(grads), -3.0, atol=0.2)

    def test_flip_reinforce_unbiased(self):
        @expectation
        def loss(p):
            b = flip_reinforce(p)
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        keys = jax.random.split(jax.random.key(2), 8000)
        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.4,))[0])(keys)
        assert jnp.allclose(jnp.mean(grads), 1.0, atol=0.1)

    def test_beta_implicit_unbiased(self):
        @expectation
        def loss(a):
            x = beta_implicit(a, 2.0)
            return x

        # E[Beta(a, 2)] = a/(a+2); dE/da = 2/(a+2)^2 = 0.2222 at a=1
        keys = jax.random.split(jax.random.key(3), 4000)
        grads = jax.vmap(lambda k: loss.grad_estimate(k, (1.0,))[0])(keys)
        assert jnp.allclose(jnp.mean(grads), 2.0 / 9.0, atol=0.05)


class TestCombinators:
    def test_baseline_same_expectation(self):
        wrapped = baseline(flip_reinforce)

        @expectation
        def loss(p):
            b = wrapped(5.0, p)  # baseline value 5.0
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        # The (deliberately bad) baseline of 5.0 inflates variance; this
        # only checks unbiasedness. Estimator std ~= 8.9 -> SE ~= 0.07.
        keys = jax.random.split(jax.random.key(4), 16000)
        grads = jax.vmap(lambda k: loss.grad_estimate(k, (0.4,))[0])(keys)
        assert jnp.allclose(jnp.mean(grads), 1.0, atol=0.25)

    def test_jvp_estimate_dual(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)

        dual = loss.jvp_estimate(
            jax.random.key(0), (Dual(jnp.asarray(0.3), jnp.asarray(1.0)),)
        )
        assert jnp.allclose(dual.primal, 0.3)
        assert jnp.allclose(dual.tangent, 1.0)


class TestValueAndGrad:
    def test_value_and_grad(self):
        @expectation
        def loss(p):
            b = flip_enum(p)
            return jax.lax.cond(b, lambda: 2.0, lambda: 0.0)

        v, (g,) = loss.value_and_grad_estimate(jax.random.key(0), (0.25,))
        assert jnp.allclose(g, 2.0)
