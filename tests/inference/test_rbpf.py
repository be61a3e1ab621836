"""Rao-Blackwellized PF: exact equality with the Kalman LML in the
degenerate (fully linear) case, agreement with a joint-state bootstrap
PF on a genuinely conditionally-linear model, and the variance reduction
that is the point of Rao-Blackwellization."""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as gx
from genjax_tpu import gen, normal
from genjax_tpu.inference.kalman import LinearGaussianSSM
from genjax_tpu.inference.particle_filter import BootstrapFilter
from genjax_tpu.inference.rbpf import RaoBlackwellFilter

A_X, Q_X, R0 = 0.9, 0.5, 0.4
A_Z, Q_Z = 0.9, 0.3


@gen
def z_init():
    return normal(0.0, 1.0) @ "z"


@gen
def z_step(z_prev, t):
    return normal(A_Z * z_prev, Q_Z) @ "z"


def lgss_of_z(z):
    """Observation noise scaled by the regime: R(z) = (R0 * e^{z/2})^2."""
    r = R0 * jnp.exp(0.5 * z)
    return LinearGaussianSSM.build(a=A_X, q=Q_X, h=1.0, r=r, d=1)


# the same model as ONE joint state for the plain bootstrap PF
@gen
def joint_init():
    z = normal(0.0, 1.0) @ "z"
    x = normal(0.0, 1.0) @ "x"
    _ = normal(x, R0 * jnp.exp(0.5 * z)) @ "y"
    return (z, x)


@gen
def joint_step(state, t):
    z_prev, x_prev = state
    z = normal(A_Z * z_prev, Q_Z) @ "z"
    x = normal(A_X * x_prev, Q_X) @ "x"
    _ = normal(x, R0 * jnp.exp(0.5 * z)) @ "y"
    return (z, x)


def simulate_data(key, T):
    k1, k2 = jax.random.split(key)
    tr = joint_init.simulate(k1, ())
    state, ys = tr.get_retval(), [tr.get_choices()["y"]]
    for t in range(1, T):
        tr = joint_step.simulate(jax.random.fold_in(k2, t), (state, t))
        state = tr.get_retval()
        ys.append(tr.get_choices()["y"])
    return jnp.array(ys)


class TestRBPF:
    def test_fully_linear_case_is_exact(self):
        """With z decoupled from the matrices, every particle carries the
        same Kalman recursion: the RBPF 'estimate' IS the exact LML."""
        m = LinearGaussianSSM.build(a=A_X, q=Q_X, h=1.0, r=R0, d=1)
        _, ys = m.sample(jax.random.key(0), 25)
        rb = RaoBlackwellFilter(z_step, z_init, lambda z: m, 64)
        lml, _ = jax.jit(rb.run)(jax.random.key(1), ys)
        assert abs(float(lml) - float(m.lml(ys))) < 1e-4

    def test_agrees_with_joint_bootstrap_pf(self):
        ys = simulate_data(jax.random.key(2), 30)
        rb = RaoBlackwellFilter(z_step, z_init, lgss_of_z, 512)
        rb_lmls = jax.vmap(lambda k: rb.run(k, ys)[0])(
            jax.random.split(jax.random.key(3), 24)
        )
        pf = BootstrapFilter(joint_step, joint_init, 8192, obs_addr="y")
        pf_lmls = jax.vmap(lambda k: pf.run(k, ys)[0])(
            jax.random.split(jax.random.key(4), 24)
        )
        # two unbiased estimators of the same evidence
        assert abs(float(jnp.mean(rb_lmls)) - float(jnp.mean(pf_lmls))) < 0.25, (
            float(jnp.mean(rb_lmls)),
            float(jnp.mean(pf_lmls)),
        )

    def test_discrete_switching_regimes(self):
        """The z-kernel can be DISCRETE (regime switching — the classic
        RBPF application): matrices select on the regime index."""
        p_stay = 0.9

        @gen
        def sw_init():
            return gx.categorical(jnp.log(jnp.array([0.5, 0.5]))) @ "z"

        @gen
        def sw_step(z_prev, t):
            logits = jnp.where(
                z_prev == 0,
                jnp.log(jnp.array([p_stay, 1 - p_stay])),
                jnp.log(jnp.array([1 - p_stay, p_stay])),
            )
            return gx.categorical(logits) @ "z"

        def sw_lgss(z):
            r = jnp.where(z == 0, 0.2, 1.0)
            return LinearGaussianSSM.build(a=0.95, q=0.3, h=1.0, r=r, d=1)

        # data from a fixed known regime sequence: half quiet, half noisy
        key = jax.random.key(7)
        T = 40
        true_z = jnp.concatenate([jnp.zeros(T // 2), jnp.ones(T // 2)])
        x = 0.5
        ys = []
        for t in range(T):
            if t:
                x = 0.95 * x + 0.3 * float(
                    jax.random.normal(jax.random.fold_in(key, 2 * t))
                )
            r = 0.2 if true_z[t] == 0 else 1.0
            ys.append(
                x + r * float(jax.random.normal(jax.random.fold_in(key, 2 * t + 1)))
            )
        ys = jnp.array(ys)[:, None]

        rb = RaoBlackwellFilter(sw_step, sw_init, sw_lgss, 512)
        lml, (zf, _, _) = jax.jit(rb.run)(jax.random.key(8), ys)
        assert bool(jnp.isfinite(lml))
        # the filtered regime posterior at the end should favor regime 1
        assert float(jnp.mean(zf)) > 0.6

    def test_variance_reduction_at_equal_particles(self):
        """The point of RB: at the SAME particle count, marginalizing the
        linear substate gives a lower-variance LML estimator than the
        joint-state PF."""
        ys = simulate_data(jax.random.key(5), 40)
        K = 256
        rb = RaoBlackwellFilter(z_step, z_init, lgss_of_z, K)
        pf = BootstrapFilter(joint_step, joint_init, K, obs_addr="y")
        keys = jax.random.split(jax.random.key(6), 32)
        rb_lmls = jax.vmap(lambda k: rb.run(k, ys)[0])(keys)
        pf_lmls = jax.vmap(lambda k: pf.run(k, ys)[0])(keys)
        assert float(jnp.std(rb_lmls)) < float(jnp.std(pf_lmls)), (
            float(jnp.std(rb_lmls)),
            float(jnp.std(pf_lmls)),
        )
