"""Stochastic volatility: the canonical particle-MCMC model family.

Beyond the reference's benchmark configs (BASELINE.md lists none for
parameter learning in state-space models): the SV model is the standard
showcase for PMMH / particle Gibbs (Andrieu, Doucet & Holenstein 2010,
§5.2) because the latent log-volatility path makes the parameter
likelihood intractable — exactly the pseudo-marginal use case.

Model (theta = {"phi": persistence, "log_sigma": log innovation sd,
"log_beta": log return scale}):

    h_0 ~ N(0, sigma^2 / (1 - phi^2))        (stationary init)
    h_t ~ N(phi * h_{t-1}, sigma^2)
    y_t ~ N(0, beta^2 * exp(h_t))            (returns, mean zero)

Parameterized with unconstrained theta leaves (tanh / exp transforms
inside the model) so the PMMH/PG random-walk proposals need no boundary
handling.
"""

import jax
import jax.numpy as jnp

from genjax_tpu import gen, normal
from genjax_tpu.inference.particle_filter import BootstrapFilter


def _unpack(theta):
    phi = jnp.tanh(theta["phi"])  # |phi| < 1: stationary
    sigma = jnp.exp(theta["log_sigma"])
    beta = jnp.exp(theta["log_beta"])
    return phi, sigma, beta


@gen
def sv_init(theta):
    phi, sigma, beta = _unpack(theta)
    stat_sd = sigma / jnp.sqrt(1.0 - phi**2)
    h = normal(0.0, stat_sd) @ "z"
    _ = normal(0.0, beta * jnp.exp(0.5 * h)) @ "y"
    return h


@gen
def sv_step(h_prev, _t, theta):
    phi, sigma, beta = _unpack(theta)
    h = normal(phi * h_prev, sigma) @ "z"
    _ = normal(0.0, beta * jnp.exp(0.5 * h)) @ "y"
    return h


def sv_log_prior(theta):
    """Weakly-informative prior on the unconstrained parameterization."""
    return (
        normal.logpdf(theta["phi"], 1.0, 1.0)  # tanh(1) ~ 0.76 persistence
        + normal.logpdf(theta["log_sigma"], -1.0, 1.0)
        + normal.logpdf(theta["log_beta"], 0.0, 1.0)
    )


def simulate_sv_data(key, T: int, theta):
    """Ground-truth (log-vol path, returns) under `theta`."""
    k0, krest = jax.random.split(key)
    tr0 = sv_init.simulate(k0, (theta,))
    h0, y0 = tr0.get_retval(), tr0.get_choices()["y"]

    def step(h, k):
        tr = sv_step.simulate(k, (h, 0, theta))
        return tr.get_retval(), (tr.get_retval(), tr.get_choices()["y"])

    _, (hs, ys) = jax.lax.scan(step, h0, jax.random.split(krest, T - 1))
    return (
        jnp.concatenate([jnp.array([h0]), hs]),
        jnp.concatenate([jnp.array([y0]), ys]),
    )


def make_sv_filter(n_particles: int = 1024, **kwargs) -> BootstrapFilter:
    return BootstrapFilter(sv_step, sv_init, n_particles, obs_addr="y", **kwargs)


def run_sv_pmmh(key, observations, theta0=None, n_particles=1024, n_steps=500,
                step_scales=0.08):
    """PMMH over the SV parameters; returns (final theta, theta chain,
    LML chain, accept flags)."""
    from genjax_tpu.inference.pmmh import PMMH

    if theta0 is None:
        theta0 = {
            "phi": jnp.asarray(1.0),
            "log_sigma": jnp.asarray(-1.0),
            "log_beta": jnp.asarray(0.0),
        }
    alg = PMMH(
        make_sv_filter(n_particles),
        log_prior=sv_log_prior,
        step_scales=jnp.asarray(step_scales),
    )
    theta, (thetas, lmls, accepts) = alg.run(
        key, theta0, observations, n_steps=n_steps
    )
    return theta, thetas, lmls, accepts
