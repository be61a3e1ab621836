"""Cookbook: the state-space toolkit — exact Kalman oracles,
Rao-Blackwellized filtering, and particle smoothing.

State-space models are where this framework's particle machinery earns
its keep. Three tools beyond the bootstrap filter: exact linear-Gaussian
inference (both a user-facing solver and the oracle every test in this
file asserts against), marginalized filtering for conditionally-linear
models, and backward-sampling smoothing.
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as genjax
from genjax_tpu import gen, normal
from genjax_tpu.inference.kalman import LinearGaussianSSM
from genjax_tpu.inference.particle_filter import BootstrapFilter
from genjax_tpu.inference.rbpf import RaoBlackwellFilter
from genjax_tpu.inference.smoothing import ffbs_sample, smoothing_clouds

A, Q, R = 0.9, 0.5, 0.4


@gen
def init_model():
    z = normal(0.0, 1.0) @ "z"
    _ = normal(z, R) @ "y"
    return z


@gen
def step_model(z_prev, t):
    z = normal(A * z_prev, Q) @ "z"
    _ = normal(z, R) @ "y"
    return z


def main():
    # --- 1. exact linear-Gaussian inference (and ground truth) ---
    m = LinearGaussianSSM.build(a=A, q=Q, h=1.0, r=R, d=1)
    zs_true, ys2 = m.sample(jax.random.key(0), 30)
    ys = ys2[:, 0]
    mus, Ps, exact_lml = m.filter(ys2)
    ms_smooth, _ = m.smooth(ys2)

    # --- 2. the particle filter agrees with the exact marginal ---
    pf = BootstrapFilter(step_model, init_model, 4096, obs_addr="y")
    lmls = jax.vmap(lambda k: pf.run(k, ys)[0])(
        jax.random.split(jax.random.key(1), 16)
    )
    assert abs(float(jnp.mean(lmls)) - float(exact_lml)) < 0.1

    # --- 3. FFBS smoothing: trajectories from the stored clouds ---
    _, clouds, lws = smoothing_clouds(pf, jax.random.key(2), ys)
    paths = ffbs_sample(jax.random.key(3), pf, clouds, lws, 256, ys)
    est = np.asarray(paths).mean(axis=0)
    assert np.max(np.abs(est - np.asarray(ms_smooth)[:, 0])) < 0.15

    # --- 4. Rao-Blackwellization: marginalize what is linear ---
    # regime-modulated observation noise: sample z, Kalman the rest
    @gen
    def regime_init():
        return normal(0.0, 1.0) @ "z"

    @gen
    def regime_step(z_prev, t):
        return normal(0.9 * z_prev, 0.3) @ "z"

    def lgss_of_z(z):
        return LinearGaussianSSM.build(
            a=A, q=Q, h=1.0, r=R * jnp.exp(0.5 * z), d=1
        )

    rb = RaoBlackwellFilter(regime_step, regime_init, lgss_of_z, 512)
    lml_rb, (z_cloud, mu_cloud, P_cloud) = jax.jit(rb.run)(
        jax.random.key(4), ys2
    )
    assert bool(jnp.isfinite(lml_rb))
    assert mu_cloud.shape == (512, 1)

    print("state space cookbook OK")


if __name__ == "__main__":
    main()
