"""Cookbook: inference quality assurance — one-call sampling with
diagnostics, PSIS importance-weight checks, and kernel validation
(simulation-based calibration + the Geweke joint test).

Habits that separate production inference from demos: (1) never read
posterior numbers without convergence diagnostics; (2) never trust an
importance sampler without looking at its weight tail; (3) before
shipping a custom kernel, prove it actually targets the posterior.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Regenerate, Selection, Target, gen, normal
from genjax_tpu.inference.psis import elpd_loo, pareto_k, psis_smooth
from genjax_tpu.inference.sample import sample_posterior
from genjax_tpu.inference.smc import ImportanceK
from genjax_tpu.inference.validation import geweke, sbc


@gen
def model():
    mu = normal(0.0, 1.0) @ "mu"
    _ = normal(mu, 1.0) @ "obs"


def main():
    # --- 1. one call: init -> warmup -> sample -> diagnose ---
    out = sample_posterior(
        jax.random.key(0), model, C.kw(obs=1.0),
        algorithm="chees", n_chains=64, n_warmup=100, n_samples=200,
        thin_burn=50,
    )
    # exact posterior: N(0.5, 0.5)
    assert abs(float(jnp.mean(out.samples["mu"])) - 0.5) < 0.1
    assert float(out.rhat["mu"]) < 1.05          # chains agree
    assert float(out.ess["mu"]) > 500            # enough information
    assert 0.4 < float(out.accept_rate) < 0.9    # kernel is tuned

    # --- 2. PSIS: is this importance sampler trustworthy? ---
    # A self-normalized IS run under the hood of ImportanceK: grab the
    # particle log-weights and check the Pareto tail.
    target = Target(model, (), C.kw(obs=1.0))
    alg = ImportanceK(target, k_particles=4096)
    coll = alg.run_smc(jax.random.key(1))
    lw = coll.log_weights
    k_hat = float(pareto_k(lw))
    # prior-as-proposal for a mildly-informative posterior: healthy tail
    assert k_hat < 0.7, f"unreliable importance weights (k={k_hat:.2f})"

    # smoothing stabilizes downstream estimates without touching the body
    sm, _ = psis_smooth(lw)
    assert float(jnp.max(sm)) <= float(jnp.max(lw)) + 1e-5

    # --- 3. SBC: is this kernel's posterior calibrated? ---
    # Simulate (mu, y) pairs from the joint, run the kernel on each
    # p(mu | y), and rank the prior mu among the chain draws. A correct
    # kernel makes the ranks uniform; any systematic bias shows up as a
    # non-flat histogram, reduced here to a chi-square p-value.
    latents = Selection.at["mu"]
    res = sbc(
        jax.random.key(2), model, (), latents, Regenerate(latents),
        n_replicates=256, n_draws=19, thin=3,
    )
    _, p_value = res.uniformity()
    assert float(p_value[0]) > 1e-3, "kernel is miscalibrated"

    # --- 4. Geweke: does the kernel leave the JOINT invariant? ---
    # Alternate the kernel with an exact data refresh y ~ p(y | mu);
    # the resulting chain must match forward simulation in every moment.
    gw = geweke(
        jax.random.key(3), model, (), latents, Regenerate(latents),
        n_forward=2048, n_steps=256, n_chains=8,
    )
    assert float(gw.max_abs_z()) < 5.0, gw.z_scores

    # --- 5. PSIS-LOO: which model predicts held-out data better? ---
    # Build the pointwise log-likelihood matrix ll[s, i] = log p(y_i |
    # theta_s) from posterior draws, and compare models by estimated
    # out-of-sample predictive density. Here: iid y ~ N(mu, 1) scored
    # under the correct noise scale vs a misspecified one (conjugate
    # posteriors, so the draws are exact).
    from jax.scipy.stats import norm as _norm

    ys = 0.7 + jax.random.normal(jax.random.key(4), (40,))
    n_data, n_draws = ys.shape[0], 2000

    def posterior_draws(noise_sd):
        prec = 1.0 + n_data / noise_sd**2          # prior N(0, 1)
        m, v = jnp.sum(ys) / noise_sd**2 / prec, 1.0 / prec
        draws = m + jnp.sqrt(v) * jax.random.normal(
            jax.random.key(5), (n_draws, 1)
        )
        return _norm.logpdf(ys[None, :], draws, noise_sd)

    good = elpd_loo(posterior_draws(1.0))
    bad = elpd_loo(posterior_draws(3.0))
    assert float(jnp.max(good.pareto_k)) < 0.7    # weights trustworthy
    assert float(good.elpd) > float(bad.elpd) + 2.0 * float(good.se)

    print("inference qa cookbook OK")


if __name__ == "__main__":
    main()
