"""Implicit-reparameterization strategies (gamma, dirichlet — new
relative to the reference's BetaIMPLICIT): gradient estimates against
closed-form derivatives of conjugate expectations, and engagement
inside VI guides."""

import jax
import jax.numpy as jnp

import genjax_tpu as gx
from genjax_tpu.adev import dirichlet_implicit, expectation, gamma_implicit
from genjax_tpu.inference import Target, vi


def pooled_grads(loss, args, n=2048, argnum=0):
    keys = jax.random.split(jax.random.key(17), n)
    grads = jax.vmap(lambda k: loss.grad_estimate(k, args)[argnum])(keys)
    return jnp.mean(grads, axis=0), jnp.std(grads, axis=0) / jnp.sqrt(n)


class TestGammaImplicit:
    def test_mean_gradient_wrt_concentration(self):
        # E[v] = c / r -> dE/dc = 1/r.
        @expectation
        def loss(c):
            return gamma_implicit(c, 2.0)

        m, se = pooled_grads(loss, (3.0,))
        assert jnp.abs(m - 0.5) < 5 * se + 1e-3

    def test_mean_gradient_wrt_rate(self):
        # E[v] = c / r -> dE/dr = -c / r^2.
        @expectation
        def loss(r):
            return gamma_implicit(3.0, r)

        m, se = pooled_grads(loss, (2.0,))
        assert jnp.abs(m - (-0.75)) < 5 * se + 1e-3

    def test_second_moment_gradient(self):
        # E[v^2] = c(c+1)/r^2 -> dE/dc = (2c+1)/r^2.
        @expectation
        def loss(c):
            v = gamma_implicit(c, 1.0)
            return v * v

        m, se = pooled_grads(loss, (2.0,), n=8192)
        assert jnp.abs(m - 5.0) < 5 * se + 5e-2


class TestDirichletImplicit:
    def test_component_mean_gradient(self):
        # E[v_0] = a0 / (a0 + a1 + a2); closed-form gradient w.r.t. a0.
        a1, a2 = 2.0, 3.0

        @expectation
        def loss(a0):
            v = dirichlet_implicit(jnp.array([a0, a1, a2]))
            return v[0]

        a0 = 1.0
        exact = (a1 + a2) / (a0 + a1 + a2) ** 2
        m, se = pooled_grads(loss, (a0,), n=4096)
        assert jnp.abs(m - exact) < 5 * se + 1e-3


class TestGuideEngagement:
    def test_gamma_guide_elbo_recovers_conjugate_posterior(self):
        """Gamma-Poisson conjugacy: prior Gamma(2, 1), one observation
        y=5 -> posterior Gamma(7, 2). Fit a Gamma(c, 2.0) guide by its
        concentration; ELBO ascent must drive c toward 7."""

        @gx.gen
        def model(_c):
            rate = gx.gamma(2.0, 1.0) @ "rate"
            _ = gx.poisson(rate) @ "y"

        @gx.marginal()
        @gx.gen
        def guide(target):
            (c,) = target.args
            _ = vi.gamma_reparam(c, 2.0) @ "rate"

        def make_target(c):
            return Target(model, (c,), gx.ChoiceMap.kw(y=5))

        loss_grad = vi.ELBO(guide, make_target)

        def train_step(carry, _):
            key, c = carry
            key, sub = jax.random.split(key)
            (g,) = loss_grad(sub, (c,))
            c = jnp.clip(c - 0.15 * g, 0.5, 20.0)  # descend the NEGATED elbo
            return (key, c), None

        (_, c), _ = jax.jit(
            lambda: jax.lax.scan(
                train_step, (jax.random.key(3), jnp.asarray(4.0)), length=300
            )
        )()
        assert jnp.abs(c - 7.0) < 0.75, c
