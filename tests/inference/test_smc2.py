"""SMC²: exactness against the Kalman grid oracle.

For a linear-Gaussian AR(1) SSM the parameter posterior and model
evidence are computable exactly (Kalman LML on a parameter grid +
quadrature), giving a closed-form target for SMC²'s weighted parameter
mean and evidence estimate — the same oracle strategy the PMMH and
particle-Gibbs suites use."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

import genjax_tpu as g
from genjax_tpu.inference.kalman import LinearGaussianSSM
from genjax_tpu.inference.smc2 import SMC2


@g.gen
def init_model(theta):
    z = g.normal(0.0, 1.0) @ "z"
    _ = g.normal(z, 0.4) @ "y"
    return z


@g.gen
def step_model(z_prev, t, theta):
    z = g.normal(theta * z_prev, 0.5) @ "z"
    _ = g.normal(z, 0.4) @ "y"
    return z


def _simulate(T=25, a_true=0.8, seed=3):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal()
    ys = [z + 0.4 * rng.standard_normal()]
    for _ in range(1, T):
        z = a_true * z + 0.5 * rng.standard_normal()
        ys.append(z + 0.4 * rng.standard_normal())
    return jnp.asarray(np.array(ys, dtype=np.float32))


def _exact(ys):
    grid = jnp.linspace(-1.5, 1.5, 301)

    def lml_a(a):
        return LinearGaussianSSM.build(a=a, q=0.5, h=1.0, r=0.4, p0=1.0).lml(
            ys[:, None]
        )

    logpost = jax.vmap(lml_a)(grid) + g.normal.logpdf(grid, 0.0, 1.0)
    w = jax.nn.softmax(logpost)
    mean = jnp.sum(w * grid)
    dx = grid[1] - grid[0]
    lml = logsumexp(logpost) + jnp.log(dx)
    return float(mean), float(lml)


def _alg(n_theta=256, n_x=256, **kw):
    return SMC2(
        step_model,
        init_model,
        prior_sample=lambda k: jax.random.normal(k),
        log_prior=lambda v: g.normal.logpdf(v, 0.0, 1.0),
        n_theta=n_theta,
        n_x=n_x,
        step_scales=jnp.asarray(0.25),
        **kw,
    )


class TestExactness:
    def test_posterior_mean_and_evidence(self):
        ys = _simulate()
        exact_mean, exact_lml = _exact(ys)
        out = jax.jit(_alg().run)(jax.random.key(0), ys)
        w = jax.nn.softmax(out["log_weights"])
        est_mean = float(jnp.sum(w * out["thetas"]))
        assert abs(est_mean - exact_mean) < 0.06
        assert abs(float(out["lml"]) - exact_lml) < 0.6
        # the run actually degenerated and rejuvenated at least once,
        # with healthy PMMH acceptance
        assert int(out["n_rejuvenations"]) >= 1
        assert 0.1 < float(out["accept_rate"]) <= 1.0

    def test_collect_hook(self):
        ys = _simulate(T=10)
        out = _alg(n_theta=32, n_x=32).run(
            jax.random.key(1),
            ys,
            collect=lambda th, lw: jnp.sum(jax.nn.softmax(lw) * th),
        )
        # T rows: row 0 is the post-y_0 state (BootstrapFilter contract)
        assert out["collected"].shape == (10,)
        assert bool(jnp.isfinite(out["collected"]).all())


class TestMaskedFilter:
    def test_masked_loglik_matches_prefix_filter(self):
        """The time-masked rejuvenation filter over y[:t] must estimate
        the same evidence as a plain filter run on the truncated
        sequence (checked in expectation over seeds, and exactly
        against the Kalman LML of the prefix)."""
        ys = _simulate(T=12)
        alg = _alg(n_theta=8, n_x=512)
        t_upto = 6
        theta = jnp.asarray(0.7)
        lls = jax.vmap(
            lambda k: alg._masked_loglik(k, theta, ys, jnp.asarray(t_upto))[0]
        )(jax.random.split(jax.random.key(2), 64))
        exact = LinearGaussianSSM.build(
            a=0.7, q=0.5, h=1.0, r=0.4, p0=1.0
        ).lml(ys[: t_upto + 1, None])
        # unbiasedness of the evidence estimate: mean of exp should hit
        # the exact prefix marginal (log-domain check with generous SE)
        est = logsumexp(lls) - jnp.log(64.0)
        assert abs(float(est) - float(exact)) < 0.15
