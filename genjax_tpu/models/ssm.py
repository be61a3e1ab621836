"""Benchmark config 3: nonlinear state-space model — SMC with systematic
resampling at 10k+ particles."""

import jax
import jax.numpy as jnp

from genjax_tpu import gen, normal
from genjax_tpu.inference.particle_filter import BootstrapFilter


def make_ssm_models(
    trans_coef: float = 0.9,
    trans_noise: float = 0.5,
    obs_noise: float = 0.4,
):
    """Nonlinear SSM: z_t = a z_{t-1} + 2.5 sin(z_{t-1}) * 0.2 + eps;
    y_t = z_t + nu (observed)."""

    @gen
    def init_model():
        z = normal(0.0, 1.0) @ "z"
        _ = normal(z, obs_noise) @ "y"
        return z

    @gen
    def step_model(z_prev, _t):
        drift = trans_coef * z_prev + 0.5 * jnp.sin(z_prev)
        z = normal(drift, trans_noise) @ "z"
        _ = normal(z, obs_noise) @ "y"
        return z

    return init_model, step_model


def simulate_ssm_data(key, T: int, **kwargs):
    """Generate a ground-truth latent/observation sequence."""
    init_model, step_model = make_ssm_models(**kwargs)
    k0, krest = jax.random.split(key)
    tr0 = init_model.simulate(k0, ())
    z0, y0 = tr0.get_retval(), tr0.get_choices()["y"]

    def step(z, k):
        tr = step_model.simulate(k, (z, 0))
        return tr.get_retval(), (tr.get_retval(), tr.get_choices()["y"])

    _, (zs, ys) = jax.lax.scan(step, z0, jax.random.split(krest, T - 1))
    return (
        jnp.concatenate([jnp.array([z0]), zs]),
        jnp.concatenate([jnp.array([y0]), ys]),
    )


def run_bootstrap_filter(
    key, observations, n_particles: int = 10_000, resampling: str = "systematic", **kwargs
):
    """Particle-filter the observation sequence; returns (LML, final z)."""
    init_model, step_model = make_ssm_models(**kwargs)
    pf = BootstrapFilter(
        step_model, init_model, n_particles, obs_addr="y", resampling=resampling
    )
    return pf.run(key, observations)
