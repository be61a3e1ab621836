"""PMMH validity: the pseudo-marginal chain must target the SAME
parameter posterior as an ideal MH chain whose likelihood is the exact
Kalman-filter marginal (Andrieu, Doucet & Holenstein 2010, Thm 2) —
regardless of the particle count used for the estimate."""

import jax
import jax.numpy as jnp

import genjax_tpu as gx
from genjax_tpu import gen, normal
from genjax_tpu.inference.particle_filter import BootstrapFilter
from genjax_tpu.inference.pmmh import PMMH

from test_kalman_oracle import kalman_lml  # rootdir-style test import

Q, R_OBS = 0.5, 0.4
A_TRUE = 0.8


@gen
def init_model(theta):
    z = normal(0.0, 1.0) @ "z"
    _ = normal(z, R_OBS) @ "y"
    return z


@gen
def step_model(z_prev, t, theta):
    z = normal(theta * z_prev, Q) @ "z"
    _ = normal(z, R_OBS) @ "y"
    return z


def log_prior(a):
    return normal.logpdf(a, 0.0, 1.0)


def simulate_data(key, T):
    ks = jax.random.split(key, 2 * T)
    z = jax.random.normal(ks[0])
    ys = []
    for t in range(T):
        if t > 0:
            z = A_TRUE * z + Q * jax.random.normal(ks[2 * t])
        ys.append(z + R_OBS * jax.random.normal(ks[2 * t + 1]))
    return jnp.array(ys)


def ideal_mh(key, ys, n_steps, scale=0.25, a0=0.5):
    """MH on `a` with the EXACT Kalman marginal likelihood — the oracle
    chain PMMH must agree with."""

    def step(carry, k):
        a, ll, lp = carry
        k1, k2 = jax.random.split(k)
        a_p = a + scale * jax.random.normal(k1)
        ll_p = kalman_lml(a_p, Q, R_OBS, ys)
        lp_p = log_prior(a_p)
        accept = jnp.log(jax.random.uniform(k2)) < ll_p + lp_p - ll - lp
        a = jnp.where(accept, a_p, a)
        ll = jnp.where(accept, ll_p, ll)
        lp = jnp.where(accept, lp_p, lp)
        return (a, ll, lp), a

    a0 = jnp.asarray(a0)
    init = (a0, kalman_lml(a0, Q, R_OBS, ys), log_prior(a0))
    _, chain = jax.lax.scan(step, init, jax.random.split(key, n_steps))
    return chain


class TestPMMHExactness:
    def test_matches_ideal_marginal_mh(self):
        ys = simulate_data(jax.random.key(0), 16)
        pf = BootstrapFilter(step_model, init_model, 512, obs_addr="y")
        alg = PMMH(pf, log_prior=log_prior, step_scales=jnp.asarray(0.25))

        # 8 parallel PMMH chains x 400 steps vs 8 ideal chains x 2000.
        n_chains, n_pm, n_ideal, burn = 8, 400, 2000, 100
        pm_keys = jax.random.split(jax.random.key(1), n_chains)
        _, (pm_thetas, pm_lmls, pm_acc) = jax.vmap(
            lambda k: alg.run(k, jnp.asarray(0.5), ys, n_steps=n_pm)
        )(pm_keys)
        id_keys = jax.random.split(jax.random.key(2), n_chains)
        id_thetas = jax.vmap(lambda k: ideal_mh(k, ys, n_ideal))(id_keys)

        pm = pm_thetas[:, burn:].reshape(-1)
        ideal = id_thetas[:, burn:].reshape(-1)
        # Agreement of posterior mean and sd. With T=16 observations the
        # posterior sd of `a` is ~0.1-0.2; MCMC error over ~2.4k/15k
        # correlated draws warrants a ~0.05 tolerance (>=5 SE of the
        # between-chain spread observed at these settings).
        assert abs(float(jnp.mean(pm)) - float(jnp.mean(ideal))) < 0.05, (
            f"PMMH mean {jnp.mean(pm):.4f} vs ideal {jnp.mean(ideal):.4f}"
        )
        assert abs(float(jnp.std(pm)) - float(jnp.std(ideal))) < 0.05
        # and both recover the generating parameter within the posterior sd
        assert abs(float(jnp.mean(pm)) - A_TRUE) < 3.0 * float(jnp.std(ideal))

    def test_acceptance_and_lml_sane(self):
        ys = simulate_data(jax.random.key(3), 12)
        pf = BootstrapFilter(step_model, init_model, 256, obs_addr="y")
        alg = PMMH(pf, log_prior=log_prior, step_scales=jnp.asarray(0.3))
        _, (thetas, lmls, accepts) = jax.jit(
            lambda k: alg.run(k, jnp.asarray(0.0), ys, n_steps=200)
        )(jax.random.key(4))
        assert bool(jnp.isfinite(lmls).all())
        # the chain must move but not accept everything
        rate = float(jnp.mean(accepts))
        assert 0.05 < rate < 0.95, f"acceptance {rate}"
        # carried LML tracks the exact marginal at the current parameter
        # within pseudo-marginal noise (a few nats at K=256)
        exact_at_final = float(kalman_lml(thetas[-1], Q, R_OBS, ys))
        assert abs(float(lmls[-1]) - exact_at_final) < 3.0

    def test_pytree_parameters(self):
        # theta as a dict pytree: both transition coefficient and a bias.
        @gen
        def init2(theta):
            z = normal(0.0, 1.0) @ "z"
            _ = normal(z, R_OBS) @ "y"
            return z

        @gen
        def step2(z_prev, t, theta):
            z = normal(theta["a"] * z_prev + theta["b"], Q) @ "z"
            _ = normal(z, R_OBS) @ "y"
            return z

        ys = simulate_data(jax.random.key(5), 10)
        pf = BootstrapFilter(step2, init2, 128, obs_addr="y")
        alg = PMMH(
            pf,
            log_prior=lambda th: normal.logpdf(th["a"], 0.0, 1.0)
            + normal.logpdf(th["b"], 0.0, 1.0),
            step_scales=jnp.asarray(0.2),
        )
        theta0 = {"a": jnp.asarray(0.5), "b": jnp.asarray(0.0)}
        theta, (outs, lmls, _) = alg.run(
            jax.random.key(6), theta0, ys, n_steps=50
        )
        assert outs["a"].shape == (50,) and outs["b"].shape == (50,)
        assert bool(jnp.isfinite(lmls).all())
