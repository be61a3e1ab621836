"""Cookbook: structural time series — compose, fit, decompose,
forecast.

STS models are the workhorse of applied forecasting: a sum of
interpretable state-space blocks (level, trend, seasonality, AR
disturbances) observed with noise. Because the blocks assemble into a
`LinearGaussianSSM`, everything is EXACT — no MCMC in the loop:

- `lml(ys)` is the exact evidence (and it's differentiable, so `fit`
  trains the component scales by direct gradient ascent on it),
- `decompose(ys)` gives smoothed per-component contributions,
- `forecast(ys, h)` gives closed-form predictive means and variances.

For non-Gaussian observation models, put the same latent blocks inside
a `@gen` model and switch to the particle toolkit (ch. 21).
"""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.models.sts import (
    StructuralTimeSeries,
    local_level,
    seasonal,
)


def main():
    # ground truth: slow level drift + quarterly seasonality
    truth = StructuralTimeSeries(
        (local_level(0.05), seasonal(4, 0.01)), obs_noise=0.2
    )
    zs, yobs = truth.ssm().sample(jax.random.key(0), 48)
    ys = yobs[:, 0]

    # --- fit scales by gradient ascent on the exact evidence ---
    init = StructuralTimeSeries(
        (local_level(0.5), seasonal(4, 0.1)), obs_noise=1.0
    )
    fitted, history = init.fit(ys, n_steps=300)
    assert float(history[-1]) > float(history[0])  # monotone-ish ascent
    assert float(fitted.lml(ys)) >= float(truth.lml(ys)) - 2.0

    # --- decompose: smoothed component contributions ---
    parts = fitted.decompose(ys)
    corr = np.corrcoef(np.asarray(zs[:, 1]), np.asarray(parts["seasonal4"]))[
        0, 1
    ]
    assert corr > 0.95, corr  # the seasonal pattern is recovered

    # --- forecast: closed-form predictive intervals ---
    means, variances = fitted.forecast(ys, horizon=8)
    assert means.shape == (8,) and bool((variances > 0).all())
    # uncertainty grows with horizon (random-walk level)
    assert float(variances[-1]) > float(variances[0])
    print(
        f"ch27 ok: seasonal corr {corr:.3f}, "
        f"fitted lml {float(fitted.lml(ys)):.1f} "
        f"(truth {float(truth.lml(ys)):.1f})"
    )


if __name__ == "__main__":
    main()
