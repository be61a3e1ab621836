"""Continuous-state PF validated against the exact Kalman-filter marginal
likelihood on a linear-Gaussian SSM, plus Gibbs driver convergence."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection, gen, normal
from genjax_tpu.inference.mcmc import gibbs_chain
from genjax_tpu.inference.particle_filter import BootstrapFilter


def kalman_lml(a, q, r, ys, mu0=0.0, p0=1.0):
    """Exact log p(y_{1:T}) for z_t = a z_{t-1} + N(0, q^2);
    y_t = z_t + N(0, r^2); z_0 ~ N(mu0, p0^2)."""

    def step(carry, y):
        mu, p, t = carry
        # predict (skip at t=0: prior is already the predictive for z_0)
        mu_pred = jnp.where(t == 0, mu, a * mu)
        p_pred = jnp.where(t == 0, p, a**2 * p + q**2)
        # observe
        s = p_pred + r**2
        ll = -0.5 * (y - mu_pred) ** 2 / s - 0.5 * jnp.log(2 * jnp.pi * s)
        k = p_pred / s
        mu_new = mu_pred + k * (y - mu_pred)
        p_new = (1 - k) * p_pred
        return (mu_new, p_new, t + 1), ll

    (_, _, _), lls = jax.lax.scan(step, (mu0, p0**2, 0), ys)
    return jnp.sum(lls)


def linear_ssm_models(a=0.9, q=0.5, r=0.4):
    @gen
    def init_model():
        z = normal(0.0, 1.0) @ "z"
        _ = normal(z, r) @ "y"
        return z

    @gen
    def step_model(z_prev, _t):
        z = normal(a * z_prev, q) @ "z"
        _ = normal(z, r) @ "y"
        return z

    return init_model, step_model


class TestKalmanOracle:
    def test_pf_lml_matches_kalman(self):
        a, q, r = 0.9, 0.5, 0.4
        ys = jnp.array([0.3, 1.0, 0.5, -0.2, 0.8, 1.4, 0.9, 0.1])
        exact = kalman_lml(a, q, r, ys)

        init_model, step_model = linear_ssm_models(a, q, r)
        pf = BootstrapFilter(step_model, init_model, 8192, obs_addr="y")
        keys = jax.random.split(jax.random.key(0), 32)
        lmls = jax.vmap(lambda k: pf.run(k, ys)[0])(keys)
        assert jnp.allclose(jnp.mean(lmls), exact, atol=0.03), (
            f"PF {jnp.mean(lmls)} vs Kalman {exact}"
        )


class TestFilteringCollect:
    def test_collected_filtering_means_match_kalman(self):
        a, q, r = 0.9, 0.5, 0.4
        ys = jnp.array([0.3, 1.0, 0.5, -0.2, 0.8, 1.4, 0.9, 0.1])
        init_model, step_model = linear_ssm_models(a, q, r)
        pf = BootstrapFilter(step_model, init_model, 8192, obs_addr="y")
        lml, _, means = jax.jit(
            lambda k: pf.run(
                k, ys,
                collect=lambda z, lw: jnp.sum(jax.nn.softmax(lw) * z),
            )
        )(jax.random.key(0))
        # Kalman filtering means oracle
        mu, p = 0.0, 1.0
        kf = []
        for t, y in enumerate(ys):
            if t:
                mu, p = a * mu, a**2 * p + q**2
            s = p + r**2
            k = p / s
            mu = mu + k * (y - mu)
            p = (1 - k) * p
            kf.append(mu)
        kf = jnp.array(kf)
        assert means.shape == ys.shape
        assert float(jnp.max(jnp.abs(means - kf))) < 0.05
        assert bool(jnp.isfinite(lml))


class TestGibbs:
    def test_gibbs_chain_converges(self):
        @gen
        def two_var():
            x = normal(0.0, 1.0) @ "x"
            z = normal(0.0, 1.0) @ "z"
            _ = normal(x + z, 0.5) @ "y"

        tr, _ = two_var.importance(jax.random.key(0), ChoiceMap.kw(y=2.0), ())
        sels = [Selection.at["x"], Selection.at["z"]]
        final, outs = jax.jit(
            lambda k, t: gibbs_chain(
                k, t, sels, 4000,
                collect=lambda tr: tr.get_choices()["x"] + tr.get_choices()["z"],
            )
        )(jax.random.key(1), tr)
        # posterior of s = x + z given y=2: prior s ~ N(0,2), obs noise
        # 0.25 -> mean = 2 * 2/(2+0.25) = 1.778
        samples = outs[1000:]
        assert jnp.allclose(jnp.mean(samples), 2.0 * 2.0 / 2.25, atol=0.1)
