"""MCMC convergence diagnostics: split R-hat and autocorrelation ESS.

Beyond the reference (genjax-community/genjax exposes no convergence
diagnostics; its tests eyeball posterior means). With this framework's
many-chain drivers (`mcmc.run_chains`, `adaptation.warmup_chains`) the
inputs are naturally `(n_chains, n_steps, ...)` arrays, and both
diagnostics are dense batched reductions — `var`/`mean` over the chain
and step axes plus one FFT for the autocorrelation — so they jit and
shard like everything else (no Python loops over chains).

Definitions follow Vehtari, Gelman, Simpson, Carpenter & Bürkner (2021),
"Rank-normalization, folding, and localization: an improved R-hat":
split-chain R-hat (each chain halved, so within-chain drift shows up as
between-chain variance) and the multi-chain ESS built from Geyer's
initial-monotone-positive-sequence truncation of the combined
autocorrelation. (Rank-normalization itself is not applied; these are
the classic moment-based forms, which is what Stan reports as
`R-hat`/`n_eff` for most models.)
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

__all__ = ["split_rhat", "effective_sample_size"]


def _split_chains(x):
    """(m, n, ...) -> (2m, n//2, ...); odd steps drop the last draw."""
    m, n = x.shape[0], x.shape[1]
    half = n // 2
    first = x[:, :half]
    second = x[:, half : 2 * half]
    return jnp.concatenate([first, second], axis=0)


def _rhat_array(x):
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    if x.ndim < 2:
        raise ValueError(
            "split_rhat expects samples of shape (n_chains, n_steps, ...); "
            f"got shape {jnp.shape(x)}."
        )
    x = _split_chains(x)
    m, n = x.shape[0], x.shape[1]
    chain_means = jnp.mean(x, axis=1)  # (2m, ...)
    chain_vars = jnp.var(x, axis=1, ddof=1)  # (2m, ...)
    between = n * jnp.var(chain_means, axis=0, ddof=1)
    within = jnp.mean(chain_vars, axis=0)
    var_plus = (n - 1) / n * within + between / n
    return jnp.sqrt(var_plus / within)


def split_rhat(samples):
    """Split-chain potential scale reduction factor.

    `samples` is an array (or pytree of arrays) with leading axes
    `(n_chains, n_steps, ...)`. Values near 1.0 indicate the chains agree
    with each other; Vehtari et al. recommend requiring R-hat < 1.01.

    >>> import jax, jax.numpy as jnp
    >>> from genjax_tpu.inference.diagnostics import split_rhat
    >>> good = jax.random.normal(jax.random.key(0), (8, 500))
    >>> bool(split_rhat(good) < 1.02)
    True
    >>> stuck = good + 10.0 * jnp.arange(8.0)[:, None]  # disjoint chains
    >>> bool(split_rhat(stuck) > 2.0)
    True
    """
    return jtu.tree_map(_rhat_array, samples)


def _ess_array(x):
    x = jnp.asarray(x, dtype=jnp.result_type(float))
    if x.ndim < 2:
        raise ValueError(
            "effective_sample_size expects samples of shape "
            f"(n_chains, n_steps, ...); got shape {jnp.shape(x)}."
        )
    m, n = x.shape[0], x.shape[1]
    # Per-chain autocovariance via FFT (zero-padded to kill circular wrap).
    centered = x - jnp.mean(x, axis=1, keepdims=True)
    size = 2 * n
    f = jnp.fft.rfft(centered, n=size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :n] / n
    mean_acov = jnp.mean(acov, axis=0)  # (n, ...)
    chain_var = jnp.mean(jnp.var(x, axis=1, ddof=1), axis=0)
    between = jnp.var(jnp.mean(x, axis=1), axis=0, ddof=1) if m > 1 else 0.0
    var_plus = (n - 1) / n * chain_var + between
    # Combined autocorrelation (Vehtari et al. eq. 10).
    rho = 1.0 - (chain_var - mean_acov) / var_plus  # (n, ...)

    # Geyer: sum consecutive lag pairs; truncate at the first negative
    # pair and enforce monotone decrease. Dense formulation: a cummin
    # over the pair sums followed by a masked sum (no data-dependent
    # loop bounds — XLA-friendly).
    n_pairs = n // 2
    pair_sums = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]  # (n//2, ...)
    positive = pair_sums > 0.0
    first_nonpositive = jnp.cumprod(positive.astype(jnp.int32), axis=0)
    monotone = jax.lax.cummin(pair_sums, axis=0)
    tau = -1.0 + 2.0 * jnp.sum(monotone * first_nonpositive, axis=0)
    # Floor tau so superefficient (antithetic) chains can exceed the
    # nominal draw count only boundedly — the arviz/Stan convention.
    tau_floor = 1.0 / jnp.log10(float(m * n)) if m * n > 10 else 1.0
    tau = jnp.maximum(tau, tau_floor)
    return m * n / tau


def effective_sample_size(samples):
    """Multi-chain effective sample size (autocorrelation-adjusted).

    `samples` is an array (or pytree of arrays) with leading axes
    `(n_chains, n_steps, ...)`. For independent draws ESS is close to the
    total draw count; heavy autocorrelation shrinks it.

    >>> import jax
    >>> from genjax_tpu.inference.diagnostics import effective_sample_size
    >>> iid = jax.random.normal(jax.random.key(1), (8, 500))
    >>> ess = float(effective_sample_size(iid))
    >>> 2500 < ess  # ~4000 nominal draws
    True
    """
    return jtu.tree_map(_ess_array, samples)
