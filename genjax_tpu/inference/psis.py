"""Pareto-smoothed importance sampling (PSIS) weight diagnostics.

Beyond the reference (which reports importance weights raw): PSIS
(Vehtari, Simpson, Gelman, Yao & Gabry 2024, JMLR 25(72), "Pareto
smoothed importance sampling") both DIAGNOSES an importance sampler and
STABILIZES it — fit a generalized Pareto distribution (GPD) to the
largest weights, report its shape k-hat (k < 0.7: estimates reliable;
k >= 0.7: the proposal misses too much tail mass to trust), and replace
the tail weights by the fitted quantiles to cut variance without
(materially) biasing means.

All fixed-shape, sort-plus-reductions JAX: the tail is selected by one
`lax.top_k`, and the GPD fit is the Zhang & Stephens (2009) profile
posterior evaluated on a fixed quadrature grid — a (grid x tail) dense
broadcast, no Newton iterations, jit/vmap-friendly. Use it on any
log-weight vector: `ImportanceK` particle weights, `ParticleCollection`
weights, IWELBO sample weights.
"""

import jax
import jax.numpy as jnp

from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import FloatArray

__all__ = [
    "LOOResult",
    "WAICResult",
    "elpd_loo",
    "elpd_waic",
    "fit_gpd_shape",
    "pareto_k",
    "psis_smooth",
]

_GRID = 128


def fit_gpd_shape(tail: FloatArray) -> tuple[FloatArray, FloatArray]:
    """Fit a generalized Pareto to `tail` (exceedances over a threshold,
    ascending or not; must be positive). Returns `(k, sigma)`.

    Zhang & Stephens (2009): profile the likelihood over theta (the grid
    variable, = -xi/sigma) via the identity k(theta) =
    mean(log1p(-theta * x)) — theta and k always take opposite signs, so
    sigma = -k/theta > 0 — evaluate the profile log-likelihood on a
    fixed quadrature grid of theta, and average theta under the
    normalized profile weights (a quasi-posterior mean, more stable than
    the MLE). Fixed shapes: one (grid, n) broadcast.
    """
    x = jnp.asarray(tail, dtype=jnp.result_type(float))
    n = x.shape[0]
    x_max = jnp.max(x)
    # quantile-anchored grid of theta < 1/x_max (Zhang-Stephens eq. at
    # m = _GRID points); x_star = 25th-percentile-based anchor
    m = _GRID
    x_star = jnp.percentile(x, 25.0)
    j = jnp.arange(1, m + 1, dtype=x.dtype)
    theta = 1.0 / x_max + (1.0 - jnp.sqrt(m / (j - 0.5))) / (3.0 * x_star)

    def profile_ll(th):
        # k(th) = mean log(1 - th x): th and k always have opposite
        # signs, so -th/k > 0 and sigma = -k/th > 0. Guard k == 0
        # (degenerate all-equal tails; the caller screens these).
        k = jnp.mean(jnp.log1p(-th * x))
        k = jnp.where(k == 0.0, -jnp.sign(th) * 1e-30, k)
        return n * (jnp.log(-th / k) - k - 1.0)

    lls = jax.vmap(profile_ll)(theta)
    w = jax.nn.softmax(lls)
    theta_hat = jnp.sum(w * theta)
    k_hat = jnp.mean(jnp.log1p(-theta_hat * x))
    sigma_hat = -k_hat / theta_hat
    # small-sample bias regularization (Vehtari et al. 2024, app. C:
    # shrink toward 0.5 with prior weight 10)
    k_hat = (n * k_hat + 5.0) / (n + 10.0)
    return k_hat, sigma_hat


def _tail_size(n: int) -> int:
    import math

    # python math, NOT jnp: this must stay a static shape under jit
    return int(min(0.2 * n, 3.0 * math.sqrt(n)))


def pareto_k(log_weights: FloatArray) -> FloatArray:
    """The PSIS k-hat diagnostic of an importance-weight vector.

    Rule of thumb (Vehtari et al. 2024): k < 0.5 excellent, k < 0.7
    usable, k >= 0.7 unreliable (the proposal's tails are too light for
    the target — add particles, improve the proposal, or temper).
    With fewer than 25 weights the tail is too small to fit and the
    diagnostic reports +inf — read it as "cannot certify" (too few
    samples), not as a certified tail problem.

    >>> import jax
    >>> from genjax_tpu.inference.psis import pareto_k
    >>> lw = jax.random.normal(jax.random.key(0), (4000,))  # lognormal w
    >>> float(pareto_k(lw)) < 0.5  # thin-tailed: safely below 0.7
    True
    """
    _, k = psis_smooth(log_weights)
    return k


def psis_smooth(
    log_weights: FloatArray,
) -> tuple[FloatArray, FloatArray]:
    """Pareto-smooth a log-weight vector; returns `(smoothed_log_weights,
    k_hat)`. The M largest weights (M = min(n/5, 3*sqrt(n))) are replaced
    by the expected order statistics of the fitted GPD, capped at the
    raw maximum; all other weights pass through. Total mass is NOT
    renormalized (do `logsumexp` yourself as usual). Vectors with fewer
    than 25 entries are returned untouched with k = +inf (tail too small
    to fit — see `pareto_k`).

    >>> import jax, jax.numpy as jnp
    >>> from genjax_tpu.inference.psis import psis_smooth
    >>> lw = 2.0 * jax.random.normal(jax.random.key(1), (4000,))
    >>> sm, k = psis_smooth(lw)
    >>> bool(jnp.max(sm) <= jnp.max(lw) + 1e-5)  # smoothing never inflates
    True
    >>> sm.shape
    (4000,)
    """
    lw = jnp.asarray(log_weights, dtype=jnp.result_type(float))
    n = lw.shape[0]
    m = _tail_size(n)
    if m < 5:
        return lw, jnp.asarray(jnp.inf, lw.dtype)

    # stabilize: work with w / max(w)
    lw_shift = lw - jnp.max(lw)
    top_vals, top_idx = jax.lax.top_k(lw_shift, m + 1)
    # threshold = (m+1)-th largest; tail = top m exceedances over it
    cutoff = top_vals[m]
    tail_lw = top_vals[:m]
    exceed = jnp.exp(tail_lw) - jnp.exp(cutoff)
    # Degenerate tail (all weights essentially equal — e.g. the proposal
    # IS the target): nothing to fit; report k = -inf (best case) and
    # leave the weights untouched.
    degenerate = jnp.max(exceed) <= 1e-10
    k_fit, sigma = fit_gpd_shape(jnp.where(degenerate, exceed + 1.0, exceed))

    # expected order statistics: GPD quantiles at p_j = (j - 1/2) / m,
    # assigned largest-quantile -> largest original weight (top_k sorts
    # descending; quantiles ascend with j, so reverse).
    p = (jnp.arange(1, m + 1, dtype=lw.dtype) - 0.5) / m
    q = jnp.exp(cutoff) + (sigma / k_fit) * (jnp.power(1.0 - p, -k_fit) - 1.0)
    q = jnp.minimum(q, jnp.exp(top_vals[0]))  # never exceed the raw max
    smoothed_tail = jnp.where(degenerate, tail_lw, jnp.log(q)[::-1])

    # scatter into the ORIGINAL vector so untouched entries round-trip
    # bit-exactly (lw - max + max does not)
    out = lw.at[top_idx[:m]].set(smoothed_tail + jnp.max(lw))
    k = jnp.where(degenerate, -jnp.inf, k_fit)
    return out, k


@Pytree.dataclass
class LOOResult(Pytree):
    """PSIS-LOO estimate: `elpd` is the expected log pointwise predictive
    density for held-out data (higher = better predictions), `se` its
    standard error, `p_loo` the effective parameter count
    (`lpd_in_sample - elpd`), `pointwise` the per-datapoint elpd
    contributions, and `pareto_k` the per-datapoint PSIS reliability
    diagnostics (any k >= 0.7 means that point's LOO weight fit is
    untrustworthy — refit without it or use more draws)."""

    elpd: FloatArray = Pytree.field()
    se: FloatArray = Pytree.field()
    p_loo: FloatArray = Pytree.field()
    pointwise: FloatArray = Pytree.field()
    pareto_k: FloatArray = Pytree.field()


def elpd_loo(loglik: FloatArray) -> LOOResult:
    """Pareto-smoothed importance-sampling leave-one-out cross-validation
    (Vehtari, Gelman & Gabry 2017).

    `loglik[s, i] = log p(y_i | theta_s)` is the pointwise log-likelihood
    matrix over `S` posterior draws and `n` data points (build it with a
    vmapped `assess`/`logpdf` over your posterior samples). Each point's
    LOO posterior is reached by importance weights `1 / p(y_i | theta_s)`,
    Pareto-smoothed per point; everything is one vmap over columns, so the
    whole estimate jits and shards along the data axis.

    Model comparison: fit competing models to the same data and prefer
    the larger `elpd` (differences beyond ~2 SE are meaningful).

    >>> import jax, jax.numpy as jnp
    >>> from genjax_tpu.inference.psis import elpd_loo
    >>> key1, key2 = jax.random.split(jax.random.key(0))
    >>> y = jax.random.normal(key1, (40,))
    >>> mus = 0.1 * jax.random.normal(key2, (2000, 1))  # posterior draws
    >>> ll = -0.5 * (y - mus) ** 2 - 0.5 * jnp.log(2 * jnp.pi)
    >>> res = elpd_loo(ll)
    >>> res.pointwise.shape, res.pareto_k.shape
    ((40,), (40,))
    >>> bool(res.elpd < jnp.sum(jax.scipy.special.logsumexp(ll, axis=0))
    ...      - 40 * jnp.log(2000.0))  # LOO penalizes vs in-sample lpd
    True
    """
    ll = jnp.asarray(loglik, dtype=jnp.result_type(float))
    if ll.ndim != 2:
        raise ValueError(
            f"elpd_loo expects loglik of shape (n_draws, n_data); got "
            f"{ll.shape}."
        )
    s = ll.shape[0]

    def one_point(ll_i):
        sm, k = psis_smooth(-ll_i)
        norm = jax.scipy.special.logsumexp(sm)
        elpd_i = jax.scipy.special.logsumexp(sm + ll_i) - norm
        return elpd_i, k

    pointwise, ks = jax.vmap(one_point, in_axes=1)(ll)
    n = pointwise.shape[0]
    lpd = jax.scipy.special.logsumexp(ll, axis=0) - jnp.log(float(s))
    elpd = jnp.sum(pointwise)
    se = jnp.sqrt(n * jnp.var(pointwise, ddof=1)) if n > 1 else jnp.inf
    return LOOResult(
        elpd=elpd,
        se=se,
        p_loo=jnp.sum(lpd - pointwise),
        pointwise=pointwise,
        pareto_k=ks,
    )


@Pytree.dataclass
class WAICResult(Pytree):
    """WAIC estimate: `elpd` the expected held-out log pointwise
    predictive density, `se` its standard error, `p_waic` the
    effective parameter count (sum of pointwise posterior variances of
    the log-likelihood), `pointwise` the per-datapoint contributions.
    Prefer `elpd_loo` when any `p_waic` pointwise term is large (> 0.4);
    WAIC's variance correction degrades before PSIS-LOO's does."""

    elpd: FloatArray = Pytree.field()
    se: FloatArray = Pytree.field()
    p_waic: FloatArray = Pytree.field()
    pointwise: FloatArray = Pytree.field()


def elpd_waic(loglik: FloatArray) -> WAICResult:
    """Widely applicable information criterion (Watanabe 2010), in the
    elpd convention of Vehtari, Gelman & Gabry 2017 (eqns 10-12):
    `elpd_waic_i = lpd_i - var_s(loglik[s, i])`. Same input as
    `elpd_loo` — the (n_draws, n_data) pointwise log-likelihood matrix —
    and asymptotically the same answer; WAIC is cheaper (no tail fits)
    but lacks the per-point k-hat reliability diagnostic.

    >>> import jax, jax.numpy as jnp
    >>> from genjax_tpu.inference.psis import elpd_waic
    >>> ll = -0.5 * jax.random.normal(jax.random.key(0), (2000, 25)) ** 2
    >>> res = elpd_waic(ll)
    >>> res.pointwise.shape
    (25,)
    >>> bool(res.p_waic > 0.0)
    True
    """
    ll = jnp.asarray(loglik, dtype=jnp.result_type(float))
    if ll.ndim != 2:
        raise ValueError(
            f"elpd_waic expects loglik of shape (n_draws, n_data); got "
            f"{ll.shape}."
        )
    s = ll.shape[0]
    lpd = jax.scipy.special.logsumexp(ll, axis=0) - jnp.log(float(s))
    p_i = jnp.var(ll, axis=0, ddof=1)
    pointwise = lpd - p_i
    n = pointwise.shape[0]
    se = jnp.sqrt(n * jnp.var(pointwise, ddof=1)) if n > 1 else jnp.inf
    return WAICResult(
        elpd=jnp.sum(pointwise),
        se=se,
        p_waic=jnp.sum(p_i),
        pointwise=pointwise,
    )
