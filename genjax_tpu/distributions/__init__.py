"""Native distribution library (pure JAX samplers + densities)."""

import jax.numpy as jnp

from genjax_tpu.distributions.distribution import (
    Distribution,
    DistributionTrace,
    ExactDensity,
    exact_density,
)
from genjax_tpu.distributions.library import (
    bernoulli,
    beta,
    beta_binomial,
    beta_quotient,
    binomial,
    categorical,
    cauchy,
    chi,
    chi2,
    dirichlet,
    dirichlet_multinomial,
    double_sided_maxwell,
    exp_gamma,
    exp_half_cauchy,
    exp_inverse_gamma,
    exponential,
    flip,
    gamma,
    geometric,
    gumbel,
    half_cauchy,
    half_normal,
    half_student_t,
    inverse_gamma,
    inverse_gaussian,
    kumaraswamy,
    lambert_w_normal,
    laplace,
    log_normal,
    logit_normal,
    moyal,
    multinomial,
    mv_normal,
    mv_normal_diag,
    native_distribution,
    negative_binomial,
    non_central_chi2,
    normal,
    poisson,
    power_spherical,
    skellam,
    student_t,
    truncated_cauchy,
    truncated_normal,
    uniform,
    von_mises,
    von_mises_fisher,
    weibull,
    zipf,
)

def tfp_distribution(dist_ctor, name: str | None = None):
    """Reference-compatible factory (`tensorflow_probability/__init__.py:35`):
    wrap a constructor returning a TFP-style distribution object — anything
    with `.sample(seed=key)` and `.log_prob(v)` (TFP-on-JAX, distrax, or a
    hand-rolled class) — as a full generative function.

    TFP itself is not a dependency of this build (the library is native,
    `library.py`); this shim exists so user code that wrapped custom
    duck-typed distributions through the reference's factory ports
    unchanged.

    >>> import jax, jax.numpy as jnp
    >>> from genjax_tpu import tfp_distribution
    >>> class Degenerate:
    ...     def __init__(self, loc):
    ...         self.loc = loc
    ...     def sample(self, seed=None, sample_shape=()):
    ...         return jnp.broadcast_to(self.loc, sample_shape)
    ...     def log_prob(self, v):
    ...         return jnp.where(v == self.loc, 0.0, -jnp.inf)
    >>> point = tfp_distribution(Degenerate, name="degenerate")
    >>> tr = point.simulate(jax.random.key(0), (2.5,))
    >>> float(tr.get_retval()), float(tr.get_score())
    (2.5, 0.0)
    """

    def sample_fn(key, *args, **kwargs):
        return dist_ctor(*args, **kwargs).sample(seed=key)

    def logpdf_fn(v, *args, **kwargs):
        lp = dist_ctor(*args, **kwargs).log_prob(v)
        if jnp.shape(lp):
            return jnp.sum(lp)
        return lp

    return native_distribution(
        sample_fn, logpdf_fn, name or getattr(dist_ctor, "__name__", "tfp")
    )

__all__ = [
    "Distribution",
    "DistributionTrace",
    "ExactDensity",
    "bernoulli",
    "beta",
    "beta_binomial",
    "beta_quotient",
    "binomial",
    "categorical",
    "cauchy",
    "chi",
    "chi2",
    "dirichlet",
    "dirichlet_multinomial",
    "double_sided_maxwell",
    "exact_density",
    "exp_gamma",
    "exp_half_cauchy",
    "exp_inverse_gamma",
    "exponential",
    "flip",
    "gamma",
    "geometric",
    "gumbel",
    "half_cauchy",
    "half_normal",
    "half_student_t",
    "inverse_gamma",
    "inverse_gaussian",
    "kumaraswamy",
    "lambert_w_normal",
    "laplace",
    "log_normal",
    "logit_normal",
    "moyal",
    "multinomial",
    "mv_normal",
    "mv_normal_diag",
    "native_distribution",
    "negative_binomial",
    "non_central_chi2",
    "normal",
    "poisson",
    "power_spherical",
    "skellam",
    "student_t",
    "tfp_distribution",
    "truncated_cauchy",
    "truncated_normal",
    "uniform",
    "von_mises",
    "von_mises_fisher",
    "weibull",
    "zipf",
]
