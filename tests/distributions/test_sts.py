"""Structural time series: block assembly against the raw Kalman
oracle, exact forecast analytics, decomposition fidelity, and
gradient-based evidence fitting."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.inference.kalman import LinearGaussianSSM
from genjax_tpu.models.sts import (
    StructuralTimeSeries,
    ar,
    local_level,
    local_linear_trend,
    seasonal,
)

YS = jnp.array([0.3, 1.0, 0.5, -0.2, 0.8])


class TestAssembly:
    def test_single_level_equals_raw_ssm(self):
        sts = StructuralTimeSeries(
            (local_level(0.2, initial_scale=1.0),), obs_noise=0.3
        )
        ref = LinearGaussianSSM.build(a=1.0, q=0.2, h=1.0, r=0.3, p0=1.0)
        assert jnp.allclose(sts.lml(YS), ref.lml(YS[:, None]), atol=1e-5)

    def test_block_dims(self):
        sts = StructuralTimeSeries(
            (local_linear_trend(), seasonal(4), ar(0.7, 0.2)),
            obs_noise=0.2,
        )
        m = sts.ssm()
        assert m.A.shape == (6, 6)  # 2 + 3 + 1
        # blocks do not couple
        assert float(m.A[0, 2]) == 0.0 and float(m.A[5, 0]) == 0.0


class TestForecast:
    def test_local_level_closed_form(self):
        """Level forecasts: constant mean; variance grows by q^2 per
        step on top of the filtered covariance plus r^2."""
        sts = StructuralTimeSeries(
            (local_level(0.2, initial_scale=1.0),), obs_noise=0.3
        )
        means, variances = sts.forecast(YS, 3)
        ref = LinearGaussianSSM.build(a=1.0, q=0.2, h=1.0, r=0.3, p0=1.0)
        mus, Ps, _ = ref.filter(YS[:, None])
        assert jnp.allclose(means, mus[-1, 0], atol=1e-6)
        expected = jnp.array(
            [float(Ps[-1, 0, 0]) + k * 0.04 + 0.09 for k in (1, 2, 3)]
        )
        assert jnp.allclose(variances, expected, atol=1e-6)


class TestDecompose:
    def test_recovers_seasonal_and_level(self):
        sts = StructuralTimeSeries(
            (local_level(0.05), seasonal(4, 0.01)), obs_noise=0.2
        )
        zs, yobs = sts.ssm().sample(jax.random.key(0), 48)
        assert bool(jnp.isfinite(yobs).all())  # singular-Q-safe sampling
        parts = sts.decompose(yobs[:, 0])
        corr_s = np.corrcoef(
            np.asarray(zs[:, 1]), np.asarray(parts["seasonal4"])
        )[0, 1]
        corr_l = np.corrcoef(np.asarray(zs[:, 0]), np.asarray(parts["level"]))[
            0, 1
        ]
        assert corr_s > 0.99
        assert corr_l > 0.85


class TestFit:
    def test_gradient_fit_recovers_scales(self):
        true = StructuralTimeSeries(
            (local_level(0.3, initial_scale=1.0),), obs_noise=0.2
        )
        _, ysim = true.ssm().sample(jax.random.key(1), 300)
        y = ysim[:, 0]
        init = StructuralTimeSeries(
            (local_level(0.05, initial_scale=1.0),), obs_noise=1.0
        )
        fitted, history = init.fit(y, n_steps=400)
        # the fitted evidence reaches (or beats: MLE) the true scales'
        assert float(fitted.lml(y)) >= float(true.lml(y)) - 1.0
        assert float(fitted.lml(y)) > float(init.lml(y)) + 50.0
        q_hat = float(fitted.components[0].q[0])
        r_hat = float(jnp.asarray(fitted.obs_noise))
        assert abs(q_hat - 0.3) < 0.1
        assert abs(r_hat - 0.2) < 0.1
        # history is the ascent trace
        assert history[-1] > history[0]
