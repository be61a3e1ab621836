"""Particle FFBS smoother against the exact RTS smoother on a
linear-Gaussian model: smoothed MEANS and VARIANCES both match (the
variance check is what separates a real smoother from a lineage-traced
filter, whose paths degenerate at early times)."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu import gen, normal
from genjax_tpu.inference.kalman import LinearGaussianSSM
from genjax_tpu.inference.particle_filter import BootstrapFilter
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


class TestFFBS:
    def setup_method(self):
        self.m = LinearGaussianSSM.build(a=A, q=Q, h=1.0, r=R, d=1)
        _, ys2 = self.m.sample(jax.random.key(0), 20)
        self.ys = ys2[:, 0]
        self.ms_exact, self.Ss_exact = self.m.smooth(ys2)
        self.pf = BootstrapFilter(step_model, init_model, 1024, obs_addr="y")

    def test_matches_rts_moments(self):
        lml, clouds, lws = jax.jit(
            lambda k: smoothing_clouds(self.pf, k, self.ys)
        )(jax.random.key(1))
        assert bool(jnp.isfinite(lml))
        paths = jax.jit(
            lambda k: ffbs_sample(k, self.pf, clouds, lws, 512, self.ys)
        )(jax.random.key(2))
        assert paths.shape == (512, 20)
        est_mean = np.asarray(paths).mean(axis=0)
        est_var = np.asarray(paths).var(axis=0)
        exact_mean = np.asarray(self.ms_exact)[:, 0]
        exact_var = np.asarray(self.Ss_exact)[:, 0, 0]
        # MC error at K=1024 clouds / M=512 paths measured ~0.03 / ~0.015
        assert np.max(np.abs(est_mean - exact_mean)) < 0.1
        assert np.max(np.abs(est_var - exact_var)) < 0.05

    def test_positive_support_observations(self):
        """Regression: the backward pass scores transitions against the
        TRUE observations. An earlier draft used a zero dummy, which for
        positive-support emission densities (log-normal here: logpdf(0)
        = -inf) made every backward weight -inf and silently collapsed
        all smoothed paths."""

        import genjax_tpu as gx

        @gen
        def ln_init2():
            z = normal(0.0, 1.0) @ "z"
            _ = gx.log_normal(z, 0.5) @ "y"
            return z

        @gen
        def ln_step2(z_prev, t):
            z = normal(A * z_prev, Q) @ "z"
            _ = gx.log_normal(z, 0.5) @ "y"
            return z

        key = jax.random.key(5)
        ys = jnp.exp(
            0.3 + 0.5 * jax.random.normal(key, (15,))
        )  # positive observations
        pf = BootstrapFilter(ln_step2, ln_init2, 512, obs_addr="y")
        _, clouds, lws = smoothing_clouds(pf, jax.random.key(6), ys)
        paths = ffbs_sample(
            jax.random.key(7), pf, clouds, lws, 128, ys
        )
        assert bool(jnp.isfinite(paths).all())
        # non-degenerate: paths disagree (collapse would zero the spread)
        assert float(jnp.std(paths[:, 0])) > 1e-3

    def test_smoothed_tighter_than_filtered_at_early_times(self):
        _, clouds, lws = smoothing_clouds(self.pf, jax.random.key(3), self.ys)
        paths = ffbs_sample(jax.random.key(4), self.pf, clouds, lws, 512, self.ys)
        # filtered variance at t=0 (prior x obs only) vs smoothed (all y)
        w0 = jax.nn.softmax(lws[0])
        filt_mean0 = jnp.sum(w0 * clouds[0])
        filt_var0 = jnp.sum(w0 * (clouds[0] - filt_mean0) ** 2)
        smooth_var0 = jnp.var(paths[:, 0])
        assert float(smooth_var0) < float(filt_var0)
