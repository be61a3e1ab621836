"""Cookbook: hierarchical partial pooling (eight schools).

The canonical multilevel model: J groups each report an effect estimate
``y_j`` with known standard error ``sigma_j``; the group effects
``theta_j`` share a population prior ``N(mu, tau^2)``. Small ``tau``
pools the groups toward ``mu``; large ``tau`` lets them stand alone —
the posterior over ``tau`` IS the amount of pooling the data supports.

Three lessons packed into one small model
(`genjax_tpu/models/hierarchical.py`):

1. **Non-centered parameterization.** Sampling ``theta`` directly
   (centered) puts a funnel in the posterior: at small ``tau`` the
   ``theta`` slab collapses to width ``tau`` and gradient samplers
   stall in the neck. Sampling ``z ~ N(0, I)`` and computing
   ``theta = mu + tau * z`` moves the geometry into the prior, where
   it is unit-scale at every ``tau``.
2. **Unconstrained scale parameters.** ``tau`` is sampled in log space
   via `exp_half_cauchy` (X = log HalfCauchy), so HMC-family kernels
   never hit the ``tau >= 0`` boundary and need no rejection wall.
3. **Initialize from a bounded box, not a heavy-tailed prior.** A
   half-Cauchy prior draw occasionally starts a chain at ``tau ~ e^7``,
   where a globally-adapted step size cannot move it — stuck chains
   bias ``tau`` upward with rhat > 1.2 (we measured 3.6x against the
   exact oracle). `sample_posterior(init=...)` takes a `ChoiceMap` or
   a ``key -> ChoiceMap`` callable (Stan's ``uniform(-2, 2)``
   convention); `run_eight_schools` wires this in.

Because ``theta`` marginalizes analytically given ``(mu, tau)``, the
whole posterior reduces to two dimensions and
`eight_schools_quadrature` computes EXACT moments for every latent —
the oracle the sampler is checked against below.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.models.hierarchical import (
    EIGHT_SCHOOLS_SIGMA,
    EIGHT_SCHOOLS_Y,
    eight_schools_quadrature,
    run_eight_schools,
)


def main():
    # --- the exact answer, by 2-D quadrature over (mu, log_tau) ---
    oracle = eight_schools_quadrature(EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA)
    print(
        f"oracle: E[mu]={float(oracle.mu_mean):.3f} "
        f"E[tau]={float(oracle.tau_mean):.3f} "
        f"logZ={float(oracle.log_evidence):.3f}"
    )

    # --- ChEES-HMC through the (non-centered) funnel ---
    out, theta = run_eight_schools(
        jax.random.key(0),
        algorithm="chees",
        n_chains=32,
        n_warmup=200,
        n_samples=250,
    )
    mu_hat = float(jnp.mean(out.samples["mu"]))
    tau_hat = float(jnp.mean(jnp.exp(out.samples["log_tau"])))
    print(
        f"chees:  E[mu]={mu_hat:.3f} E[tau]={tau_hat:.3f} "
        f"rhat(log_tau)={float(out.rhat['log_tau']):.3f}"
    )
    assert abs(mu_hat - float(oracle.mu_mean)) < 0.5
    assert abs(tau_hat - float(oracle.tau_mean)) < 0.6
    assert float(out.rhat["log_tau"]) < 1.05

    # --- partial pooling, visibly: school 0 reported y=28 but its
    # posterior mean is pulled most of the way toward the population ---
    th_hat = np.asarray(jnp.mean(theta, axis=(0, 1)))
    th_exact = np.asarray(oracle.theta_mean)
    print("school  y      E[theta] (exact)")
    for j in range(8):
        print(
            f"  {j}    {float(EIGHT_SCHOOLS_Y[j]):5.1f}   "
            f"{th_hat[j]:6.2f}  ({th_exact[j]:6.2f})"
        )
    assert np.max(np.abs(th_hat - th_exact)) < 0.6
    assert th_hat[0] < 10.0  # y[0]=28 shrunk by ~3/4 toward mu


if __name__ == "__main__":
    main()
