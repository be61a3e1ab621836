"""Fused streaming logsumexp over large (particle-axis) vectors.

A single-pass online logsumexp: each grid step consumes one VMEM tile and
folds it into running (max, scaled-sum) accumulators in SMEM/VMEM scratch.
Saves one full HBM read versus the two-pass max-then-sum lowering XLA
emits for `jax.scipy.special.logsumexp` on vectors that exceed cache.

Layout: the 1-D weight vector is reshaped to (rows, 128) lanes; tiles of
(TILE_ROWS, 128) stream through VMEM.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_ROWS = 512  # 512 x 128 x 4B = 256 KiB per tile


def _lse_kernel(x_ref, out_ref, m_scratch, s_scratch):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        m_scratch[0, 0] = -jnp.inf
        s_scratch[0, 0] = 0.0

    tile = x_ref[:]
    tile_max = jnp.max(tile)
    m_old = m_scratch[0, 0]
    m_new = jnp.maximum(m_old, tile_max)
    # Rescale the running sum to the new max, then fold the tile in.
    s_scratch[0, 0] = s_scratch[0, 0] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(tile - m_new)
    )
    m_scratch[0, 0] = m_new

    @pl.when(i == pl.num_programs(0) - 1)
    def _finish():
        out_ref[0, 0] = m_scratch[0, 0] + jnp.log(s_scratch[0, 0])


def fused_logsumexp(x: jax.Array, interpret: bool = False) -> jax.Array:
    """One-pass logsumexp of a 1-D vector via a Pallas TPU kernel.

    Pads with -inf to a (rows, 128) layout; rows are streamed in
    (TILE_ROWS, 128) blocks.
    """
    n = x.shape[0]
    rows = max(8, pl.cdiv(n, LANES))
    # Round rows up to a multiple of the tile height if multiple tiles.
    if rows > TILE_ROWS:
        rows = pl.cdiv(rows, TILE_ROWS) * TILE_ROWS
        tile_rows = TILE_ROWS
    else:
        tile_rows = rows
    padded = rows * LANES
    x2 = jnp.full((padded,), -jnp.inf, dtype=jnp.float32).at[:n].set(
        x.astype(jnp.float32)
    )
    x2 = x2.reshape(rows, LANES)
    grid = (rows // tile_rows,)

    out = pl.pallas_call(
        _lse_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2)
    return out[0, 0]
