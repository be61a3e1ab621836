"""Cookbook: inference quality assurance — one-call sampling with
diagnostics, and PSIS importance-weight checks.

Two habits that separate production inference from demos: (1) never
read posterior numbers without convergence diagnostics; (2) never trust
an importance sampler without looking at its weight tail.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Target, gen, normal
from genjax_tpu.inference.psis import pareto_k, psis_smooth
from genjax_tpu.inference.sample import sample_posterior
from genjax_tpu.inference.smc import ImportanceK


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

    print("inference qa cookbook OK")


if __name__ == "__main__":
    main()
