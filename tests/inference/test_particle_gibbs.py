"""Particle Gibbs validity on a linear-Gaussian SSM:

- the CSMC sweep is a Markov kernel whose stationary law is the exact
  smoothing distribution p(z_{0:T-1} | y, theta) — checked against an
  RTS smoother oracle, with and without ancestor sampling;
- the full PG chain's parameter marginal matches an ideal MH chain
  using the exact Kalman marginal likelihood (same oracle discipline as
  tests/inference/test_pmmh.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as gx
from genjax_tpu import gen, normal
from genjax_tpu.inference.particle_filter import BootstrapFilter
from genjax_tpu.inference.particle_gibbs import ParticleGibbs, csmc_sweep

from test_kalman_oracle import kalman_lml  # rootdir-style test import

Q, R_OBS = 0.5, 0.4
A_TRUE = 0.8


@gen
def init_model(a):
    z = normal(0.0, 1.0) @ "z"
    _ = normal(z, R_OBS) @ "y"
    return z


@gen
def step_model(z_prev, t, a):
    z = normal(a * z_prev, Q) @ "z"
    _ = normal(z, R_OBS) @ "y"
    return z


def rts_smoother(a, q, r, ys, mu0=0.0, p0=1.0):
    """Exact smoothed means E[z_t | y_{0:T-1}] for the linear-Gaussian
    SSM of `kalman_lml` (z_0 ~ N(mu0, p0^2), y_0 observed)."""
    T = ys.shape[0]
    mu_f = np.zeros(T)
    p_f = np.zeros(T)
    mu_p = np.zeros(T)
    p_p = np.zeros(T)
    mu, p = mu0, p0**2
    for t in range(T):
        if t > 0:
            mu, p = a * mu, a**2 * p + q**2
        mu_p[t], p_p[t] = mu, p
        s = p + r**2
        k = p / s
        mu = mu + k * (ys[t] - mu)
        p = (1 - k) * p
        mu_f[t], p_f[t] = mu, p
    mu_s = np.zeros(T)
    mu_s[-1] = mu_f[-1]
    for t in range(T - 2, -1, -1):
        c = p_f[t] * a / p_p[t + 1]
        mu_s[t] = mu_f[t] + c * (mu_s[t + 1] - mu_p[t + 1])
    return mu_s


def simulate_data(key, T):
    ks = jax.random.split(key, 2 * T)
    z = 0.3
    ys = []
    for t in range(T):
        if t > 0:
            z = A_TRUE * z + Q * float(jax.random.normal(ks[2 * t]))
        ys.append(z + R_OBS * float(jax.random.normal(ks[2 * t + 1])))
    return jnp.array(ys)


def run_csmc_chain(key, pf, ys, a, n_sweeps, ancestor_sampling):
    """Iterate the CSMC kernel at fixed parameters; collect the paths."""

    def sweep(path, k):
        new = csmc_sweep(
            k, pf, ys, path, (jnp.asarray(a),),
            ancestor_sampling=ancestor_sampling,
        )
        return new, new

    init = jnp.zeros_like(ys)
    _, paths = jax.lax.scan(sweep, init, jax.random.split(key, n_sweeps))
    return paths  # (n_sweeps, T)


class TestCSMCSmoothing:
    def _check(self, ancestor_sampling, key):
        ys = simulate_data(jax.random.key(0), 12)
        exact = rts_smoother(A_TRUE, Q, R_OBS, np.asarray(ys))
        pf = BootstrapFilter(step_model, init_model, 64, obs_addr="y")
        paths = jax.jit(
            lambda k: run_csmc_chain(
                k, pf, ys, A_TRUE, 800, ancestor_sampling
            ),
            static_argnames=(),
        )(key)
        est = np.asarray(paths)[200:].mean(axis=0)
        # Smoothed marginal sds here are ~0.35; 600 correlated sweeps give
        # SE well under 0.05, so 0.12 is >=4-6 SE at every time index.
        assert np.max(np.abs(est - exact)) < 0.12, (
            f"max dev {np.max(np.abs(est - exact))}: {est} vs {exact}"
        )

    def test_pgas_targets_smoothing_distribution(self):
        self._check(True, jax.random.key(1))

    def test_plain_csmc_targets_smoothing_distribution(self):
        self._check(False, jax.random.key(2))


class TestParticleGibbsExactness:
    def test_matches_ideal_marginal_mh(self):
        ys = simulate_data(jax.random.key(3), 16)
        pf = BootstrapFilter(step_model, init_model, 128, obs_addr="y")
        pg = ParticleGibbs(
            pf,
            log_prior=lambda a: normal.logpdf(a, 0.0, 1.0),
            step_scales=jnp.asarray(0.25),
            theta_steps=3,
        )
        n_chains, n_sweeps, burn = 8, 500, 100
        keys = jax.random.split(jax.random.key(4), n_chains)
        _, _, (pg_thetas, _) = jax.vmap(
            lambda k: pg.run(k, jnp.asarray(0.5), ys, n_sweeps=n_sweeps)
        )(keys)

        # ideal chain: MH on `a` with the exact Kalman marginal
        def ideal_step(carry, k):
            a, ll, lp = carry
            k1, k2 = jax.random.split(k)
            a_p = a + 0.25 * jax.random.normal(k1)
            ll_p = kalman_lml(a_p, Q, R_OBS, ys)
            lp_p = normal.logpdf(a_p, 0.0, 1.0)
            acc = jnp.log(jax.random.uniform(k2)) < ll_p + lp_p - ll - lp
            return (
                jnp.where(acc, a_p, a),
                jnp.where(acc, ll_p, ll),
                jnp.where(acc, lp_p, lp),
            ), jnp.where(acc, a_p, a)

        def ideal_chain(k):
            a0 = jnp.asarray(0.5)
            init = (a0, kalman_lml(a0, Q, R_OBS, ys), normal.logpdf(a0, 0.0, 1.0))
            _, chain = jax.lax.scan(
                ideal_step, init, jax.random.split(k, 2000)
            )
            return chain

        id_thetas = jax.vmap(ideal_chain)(
            jax.random.split(jax.random.key(5), n_chains)
        )
        pg_s = np.asarray(pg_thetas)[:, burn:].reshape(-1)
        id_s = np.asarray(id_thetas)[:, 200:].reshape(-1)
        assert abs(pg_s.mean() - id_s.mean()) < 0.05, (
            f"PG mean {pg_s.mean():.4f} vs ideal {id_s.mean():.4f}"
        )
        assert abs(pg_s.std() - id_s.std()) < 0.05

    def test_pytree_theta_and_collect(self):
        ys = simulate_data(jax.random.key(6), 8)

        @gen
        def init2(th):
            z = normal(0.0, 1.0) @ "z"
            _ = normal(z, R_OBS) @ "y"
            return z

        @gen
        def step2(z_prev, t, th):
            z = normal(th["a"] * z_prev + th["b"], Q) @ "z"
            _ = normal(z, R_OBS) @ "y"
            return z

        pf = BootstrapFilter(step2, init2, 32, obs_addr="y")
        pg = ParticleGibbs(
            pf,
            log_prior=lambda th: normal.logpdf(th["a"], 0.0, 1.0)
            + normal.logpdf(th["b"], 0.0, 1.0),
            step_scales=jnp.asarray(0.2),
        )
        theta0 = {"a": jnp.asarray(0.5), "b": jnp.asarray(0.0)}
        theta, path, (outs, accs) = pg.run(
            jax.random.key(7), theta0, ys, n_sweeps=25,
            collect=lambda th, p: (th["a"], p[0]),
        )
        assert outs[0].shape == (25,) and outs[1].shape == (25,)
        assert path.shape == (8,)
        assert bool(jnp.isfinite(outs[0]).all())
