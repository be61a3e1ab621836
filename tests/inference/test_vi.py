"""Variational inference convergence tests on conjugate models
(parity: reference tests/inference/test_vi.py)."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Target
from genjax_tpu.inference import vi


class TestELBO:
    def test_normal_normal_tight_variance(self):
        @g.gen
        def model(v):
            mu = g.normal(0.0, 10.0) @ "mu"
            _ = g.normal(mu, 0.1) @ "v"

        @g.marginal()
        @g.gen
        def guide(target):
            (v,) = target.args
            _ = vi.normal_reparam(v, 0.1) @ "mu"

        elbo_grad = vi.ELBO(guide, lambda v: Target(model, (v,), C.kw(v=3.0)))
        key = jax.random.key(314159)
        v = 0.1
        jitted = jax.jit(elbo_grad)
        for _ in range(400):
            (v_grad,) = jitted(key, (v,))
            v -= 1e-3 * v_grad
        assert v == pytest.approx(3.0, 5e-2)

    def test_elbo_learns_posterior_mean_and_scale(self):
        # latent mu ~ N(0, 1); y ~ N(mu, 1); observe y=2 -> posterior
        # N(1, 1/sqrt(2)).
        @g.gen
        def model(_vmu, _log_vsigma):
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        @g.marginal()
        @g.gen
        def guide(target):
            vmu, log_vsigma = target.args
            _ = vi.normal_reparam(vmu, jnp.exp(log_vsigma)) @ "mu"

        def make_target(vmu, log_vsigma):
            return Target(model, (vmu, log_vsigma), C.kw(y=2.0))

        elbo_grad = jax.jit(vi.ELBO(guide, make_target))
        params = (0.0, 0.0)
        key = jax.random.key(0)
        trail = []
        for i in range(1200):
            key, sub = jax.random.split(key)
            grads = elbo_grad(sub, params)
            lr = 2e-2 if i < 600 else 5e-3
            params = tuple(p - lr * gr for p, gr in zip(params, grads))
            if i >= 1000:
                trail.append(params)
        avg = tuple(jnp.mean(jnp.array(ps)) for ps in zip(*trail))
        assert avg[0] == pytest.approx(1.0, abs=0.15)
        assert jnp.exp(avg[1]) == pytest.approx(1.0 / jnp.sqrt(2.0), abs=0.1)


class TestIWELBO:
    def test_iwelbo_gradient_finite(self):
        @g.gen
        def model(v):
            mu = g.normal(0.0, 10.0) @ "mu"
            _ = g.normal(mu, 0.1) @ "v"

        @g.marginal()
        @g.gen
        def guide(target):
            (v,) = target.args
            _ = vi.normal_reparam(v, 0.1) @ "mu"

        iwelbo_grad = vi.IWELBO(
            guide, lambda v: Target(model, (v,), C.kw(v=3.0)), N=4
        )
        (grad,) = jax.jit(iwelbo_grad)(jax.random.key(0), (1.0,))
        assert jnp.isfinite(grad)
        # gradient should point toward 3.0 (loss is -LML estimate)
        assert grad < 0.0


class TestWakeSleep:
    def test_pwake_qwake_finite(self):
        @g.gen
        def model(theta):
            mu = g.normal(theta, 1.0) @ "mu"
            _ = g.normal(mu, 0.5) @ "y"

        @g.marginal()
        @g.gen
        def approx(target):
            (theta,) = target.args
            _ = vi.normal_reparam(theta, 0.7) @ "mu"

        make_target = lambda theta: Target(model, (theta,), C.kw(y=1.0))
        p_grad = vi.PWake(approx, make_target)(jax.random.key(0), (0.5,))
        q_grad = vi.QWake(approx, approx, make_target)(jax.random.key(1), (0.5,))
        assert jnp.isfinite(p_grad[0])
        assert jnp.isfinite(q_grad[0])
