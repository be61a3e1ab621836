"""Benchmark config 5 (stretch): ADEV-trained variational guide driving
RAVI-style nested SMC.

Pipeline: train a reparameterized guide with ELBO gradient descent
(ADEV), then use it as the proposal inside `ImportanceK` at large K —
the guide's quality shows up directly as lower-variance LML estimates.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Target, gen, normal
from genjax_tpu.inference import vi
from genjax_tpu.inference.smc import ImportanceK


@gen
def model(_vmu, _vls):
    mu = normal(0.0, 1.0) @ "mu"
    _ = normal(mu, 0.5) @ "y"
    return mu


@g.marginal()
@gen
def guide(target):
    vmu, vls = target.args
    _ = vi.normal_reparam(vmu, jnp.exp(vls)) @ "mu"


def make_target(vmu, vls, obs=2.0):
    return Target(model, (vmu, vls), ChoiceMap.kw(y=obs))


def train_guide(key, n_steps: int = 300, lr: float = 2e-2, obs: float = 2.0):
    """ELBO-train the guide's (mean, log-scale); returns the params."""
    elbo_grad = jax.jit(
        vi.ELBO(guide, lambda vmu, vls: make_target(vmu, vls, obs))
    )
    params = (0.0, 0.0)
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        grads = elbo_grad(sub, params)
        params = tuple(p - lr * gr for p, gr in zip(params, grads))
    return params


def nested_smc_lml(key, params, k_particles: int, obs: float = 2.0):
    """LML estimate using the trained guide as the SIR proposal."""
    target = make_target(*params, obs=obs)
    alg = ImportanceK(target, q=guide, k_particles=k_particles)
    return alg.estimate_normalizing_constant(key, target)


def run_ravi(key, n_train: int = 300, k_particles: int = 100_000, obs: float = 2.0):
    """Full pipeline. Returns (params, guided LML, prior-proposal LML,
    exact LML)."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = train_guide(k1, n_steps=n_train, obs=obs)
    lml_guided = nested_smc_lml(k2, params, k_particles, obs)
    target = make_target(*params, obs=obs)
    lml_prior = ImportanceK(target, k_particles=k_particles).estimate_normalizing_constant(
        k3, target
    )
    exact = (
        -0.5 * obs**2 / (1.0 + 0.25)
        - 0.5 * jnp.log(2 * jnp.pi * (1.0 + 0.25))
    )
    return params, lml_guided, lml_prior, exact
