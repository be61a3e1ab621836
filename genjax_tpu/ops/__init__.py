"""Pallas TPU kernels for inference hot loops.

One kernel has earned its keep: `fused_logsumexp`, a single-pass
streaming logsumexp (measured 1.43x over XLA's two-pass lowering at K=1M
on the v5e: 47 us vs 68 us, 84 vs 59 GB/s effective). It is OPT-IN via
`use_fused_logsumexp(True)` because Pallas kernels remote-compile slowly
on tunneled devices (~7 min per kernel per process); once enabled,
`ParticleCollection.get_log_marginal_likelihood_estimate` dispatches
large 1-D reductions to it on TPU backends.

(A binary-search systematic-resampling kernel was built, validated in
interpret mode, and DELETED: the search-free XLA formulation in
`inference/smc.py` — scatter + `lax.cummax` — is faster than any
per-probe search, kernel or not.)

Mosaic lowering caveat (learned from that deleted kernel): TPU Mosaic's
gather lowering only supports ELEMENTWISE-form indices — `x[idx]` with a
free gather axis fails to lower; reformulate as one-hot matmul, scatter,
or `lax.cummax`-style scans instead.
"""

import jax
import jax.numpy as jnp

from genjax_tpu.ops.logsumexp import fused_logsumexp

_FUSED_LSE_ENABLED = False
_FUSED_LSE_MIN_SIZE = 262_144


def use_fused_logsumexp(enable: bool = True) -> None:
    """Opt in to the Pallas fused logsumexp for large particle-axis
    reductions (TPU only; first call pays the kernel compile)."""
    global _FUSED_LSE_ENABLED
    _FUSED_LSE_ENABLED = enable


def maybe_fused_logsumexp(x) -> jax.Array:
    """`logsumexp(x)` for 1-D `x`, dispatching to the fused Pallas kernel
    when opted in, on a TPU backend, and large enough to be
    bandwidth-bound; XLA's lowering otherwise."""
    from jax.scipy.special import logsumexp

    if (
        _FUSED_LSE_ENABLED
        and x.ndim == 1
        and x.shape[0] >= _FUSED_LSE_MIN_SIZE
        and jax.default_backend() == "tpu"
    ):
        return fused_logsumexp(x)
    return logsumexp(x)


__all__ = ["fused_logsumexp", "maybe_fused_logsumexp", "use_fused_logsumexp"]
