"""Benchmark model zoo (the BASELINE.md configs) + application models."""

from genjax_tpu.models.beta_bernoulli import beta_bernoulli, run_sir
from genjax_tpu.models.hierarchical import (
    EIGHT_SCHOOLS_SIGMA,
    EIGHT_SCHOOLS_Y,
    eight_schools,
    eight_schools_centered,
    eight_schools_quadrature,
    run_eight_schools,
)
from genjax_tpu.models.gp import (
    gp_posterior,
    make_gp_regression,
    matern32_kernel,
    rbf_kernel,
    run_gp_ess,
)
from genjax_tpu.models.gmm import make_gmm, run_gibbs, simulate_gmm_data
from genjax_tpu.models.logreg import logistic_regression, run_hmc_chains, run_mala_chains
from genjax_tpu.models.polyreg import polynomial_regression, run_is_mh
from genjax_tpu.models.sts import (
    StructuralTimeSeries,
    ar,
    local_level,
    local_linear_trend,
    seasonal,
)
from genjax_tpu.models.ssm import (
    make_ssm_models,
    run_bootstrap_filter,
    simulate_ssm_data,
)
from genjax_tpu.models.stochvol import (
    make_sv_filter,
    run_sv_pmmh,
    simulate_sv_data,
    sv_log_prior,
)

__all__ = [
    "StructuralTimeSeries",
    "ar",
    "beta_bernoulli",
    "EIGHT_SCHOOLS_SIGMA",
    "EIGHT_SCHOOLS_Y",
    "eight_schools",
    "eight_schools_centered",
    "eight_schools_quadrature",
    "run_eight_schools",
    "logistic_regression",
    "gp_posterior",
    "make_gmm",
    "make_gp_regression",
    "matern32_kernel",
    "rbf_kernel",
    "run_gp_ess",
    "make_ssm_models",
    "polynomial_regression",
    "run_bootstrap_filter",
    "run_gibbs",
    "run_hmc_chains",
    "run_is_mh",
    "run_mala_chains",
    "local_level",
    "local_linear_trend",
    "run_sir",
    "seasonal",
    "make_sv_filter",
    "run_sv_pmmh",
    "simulate_gmm_data",
    "simulate_ssm_data",
    "simulate_sv_data",
    "sv_log_prior",
]
