"""Streaming exact expansion for systematic-resampling ancestors.

New TPU-native capability with no reference counterpart (the reference
ships no resampling at all — SURVEY.md §2 C26). Replaces the row-gather
`x[anc]` on resampling hot paths.

Why: XLA's TPU gather/scatter lowering is PER-INDEX bound on this part —
measured ~130M indices/s regardless of row width (7.5 ms for 1M rows at
F=1, 39 ms at F=32; `tools/microbench_gather.py`), i.e. 1-7 GB/s against
a ~740 GB/s streaming roof. Rolls and selects, by contrast, stream at
full bandwidth. Systematic/stratified resampling produces NON-DECREASING
ancestors, and a non-decreasing gather is an *expansion*: surviving
particle j's row is copied into the contiguous output block
[N_{j-1}, N_j) given cumulative counts N. That structure admits an exact
O(log N)-depth algorithm built entirely from `jnp.roll` + `jnp.where`
passes over the packed row matrix:

1. **Compact** (left-shift): survivor j moves left by the number of dead
   rows before it, landing at its survivor rank c. Displacements are
   one-sided and non-decreasing, so MSB-first binary hops are
   conflict-free (intermediate positions stay strictly increasing: with
   `high_k` monotone in the displacement, `c + high_k(delta_c)` is
   strictly increasing in c). The block start N_{j-1} rides along as a
   payload column.
2. **Spread** (right-shift): the survivor at rank c moves right to its
   block start t_c — again one-sided non-decreasing (t_{c+1} >= t_c + 1
   implies t_c - c non-decreasing), same MSB-first hops.
3. **Fill forward**: pointer-doubling max-scan copies each block start's
   row across its run.

Phases 2-3 are `while_loop`s of roll+select passes whose stage count
adapts to the runtime displacement/run bounds (near-uniform weights cost
only a few passes); phase 1 is one variadic `lax.sort` (TPU sorts
stream at ~30x gather bandwidth). Measured at 1M x F=1: ~4.5 ms vs
6.4 ms for the take — AND no ancestor vector is ever materialized,
which saves the additional ~7 ms scalar scatter the ancestor-based
resamplers pay.

Interface: `expand_rows(tree, cum_counts, n_rows=...)` — consumes the
cumulative-count vector that `systematic_resample` (inference/smc.py)
already computes internally, NOT the ancestor vector (deriving
survivor flags from ancestors would need a scatter, reintroducing the
per-index cost).
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from genjax_tpu.core.typing import IntArray




def _route_right(cols, rem, n: int):
    """Move rows (stored as a TUPLE of (N,) column arrays — TPU pads a
    2-d minor dim to 128 lanes, so an (N, F) layout wastes ~F/128 of the
    bandwidth of every pass) toward higher lanes by their exact remaining
    displacement `rem` (one-sided, non-decreasing over occupied lanes;
    rem < 0 marks an empty lane), via MSB-first binary hops. Conflict-
    free: the c-th row's intermediate position c + high_k(delta_c) is
    strictly increasing in c because high_k is monotone in delta. Rows
    move by the exact bit decomposition of their displacement.

    One `while_loop` body with a dynamic roll shift (not an unrolled
    per-stage graph): the stage count adapts to the runtime displacement
    bound and the compiled program stays small (an unrolled 20-cond
    chain took minutes of XLA compile time through the remote-compile
    tunnel)."""
    max_rem = jnp.maximum(jnp.max(rem), 0)
    # First stage index = position of max_rem's highest set bit (the
    # +0.5 nudge makes the float log2 round safely HIGH, never low; a
    # too-high stage is a no-op pass).
    k0 = jnp.ceil(jnp.log2(jnp.maximum(max_rem, 1).astype(jnp.float32) + 0.5))
    k0 = k0.astype(jnp.int32)

    def cond(state):
        k, _, _ = state
        return k >= 0

    def body(state):
        k, cols, rem = state
        hop = jnp.left_shift(jnp.int32(1), k)
        src_rem = jnp.roll(rem, hop)
        incoming = (src_rem >= 0) & ((src_rem & hop) != 0)
        # A lane never both keeps a finished row and receives one
        # (conflict-freedom above), so the two selects can't clash.
        vacated = (rem >= 0) & ((rem & hop) != 0)
        new_cols = tuple(
            jnp.where(incoming, jnp.roll(c, hop), c) for c in cols
        )
        new_rem = jnp.where(
            incoming, src_rem - hop, jnp.where(vacated, -1, rem)
        )
        return k - 1, new_cols, new_rem

    _, cols, rem = jax.lax.while_loop(cond, body, (k0, cols, rem))
    return cols, rem


def _fill_forward(cols, marked, max_run, n: int):
    """Copy each marked lane's row rightward across its run (to every lane
    whose nearest marked lane at-or-before it is that one), by pointer
    doubling on (columns, source-index). Column-tuple layout and one
    `while_loop` body — see `_route_right` for why."""
    iota = jnp.arange(n, dtype=jnp.int32)
    src = jnp.where(marked, iota, -1)

    def cond(state):
        hop, _, _ = state
        return hop < max_run

    def body(state):
        hop, cols, src = state
        cand_src = jnp.where(iota >= hop, jnp.roll(src, hop), -1)
        take = cand_src > src
        new_cols = tuple(
            jnp.where(take, jnp.roll(c, hop), c) for c in cols
        )
        return hop * 2, new_cols, jnp.maximum(src, cand_src)

    _, cols, _ = jax.lax.while_loop(cond, body, (jnp.int32(1), cols, src))
    return cols


def expand_cols(cols, cum_counts: IntArray):
    """Expand a tuple of (N,) column arrays by cumulative block counts:
    output slot i of every column gets its row j where N_{j-1} <= i < N_j.
    Exactly `c[anc]` per column for the systematic/stratified ancestor
    vector derived from `cum_counts`."""
    n = cols[0].shape[0]
    assert cum_counts.shape[0] == n, (
        "streaming expansion requires as many sources as output slots"
    )
    cum = cum_counts.astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    counts = cum - starts
    survive = counts > 0
    iota = jnp.arange(n, dtype=jnp.int32)

    # Phase 1 — compact survivors to rank lanes via ONE variadic sort
    # (TPU sorts stream; measured ~30x the bandwidth of a gather). Key:
    # survivors keep their order, dead rows sink to the back. Each row
    # carries its block start as a payload column.
    key1 = jnp.where(survive, iota, iota + n)
    _, start_at, live, *sorted_cols = jax.lax.sort(
        (key1, starts, survive.astype(jnp.int32)) + tuple(cols),
        num_keys=1,
    )

    # Phase 2 — spread rank-c survivor right to its block start t_c
    # (t_c - c is one-sided non-decreasing). rem < 0 marks empty lanes.
    rem = jnp.where(live > 0, start_at - iota, -1)
    sorted_cols, rem = _route_right(tuple(sorted_cols), rem, n)

    # Phase 3 — fill each block forward across its run.
    return _fill_forward(sorted_cols, rem == 0, jnp.max(counts), n)


def expand_rows_packed(x, cum_counts: IntArray):
    """(N, F)-matrix convenience wrapper over `expand_cols`."""
    cols = expand_cols(tuple(x[:, f] for f in range(x.shape[1])), cum_counts)
    return jnp.stack(cols, axis=1)


def expand_rows(tree, cum_counts: IntArray, n_rows: int | None = None):
    """`take_rows(tree, anc)` for the monotone ancestors encoded by
    `cum_counts`, lowered as streaming passes instead of a per-index
    gather. Leaves whose leading dim differs from `n_rows` pass through
    untouched (shared model args), matching `take_rows` semantics.

    Every leaf is decomposed into (N,) columns and all columns ride ONE
    sort + route + fill pipeline (mixed dtypes are fine — `lax.sort` is
    variadic), so the per-lane layout stays fully utilized."""
    leaves, treedef = jtu.tree_flatten(tree)
    if not leaves:
        return tree
    cum_counts = jnp.asarray(cum_counts)
    out: list = [None] * len(leaves)
    cols: list = []
    spans: list = []  # (leaf index, first column, n columns)
    for i, leaf in enumerate(leaves):
        ndim = getattr(leaf, "ndim", 0)
        if n_rows is not None and (ndim == 0 or jnp.shape(leaf)[0] != n_rows):
            out[i] = leaf
            continue
        if not hasattr(leaf, "dtype") or ndim < 1:
            raise TypeError(f"expand_rows: unsupported leaf {type(leaf)}")
        n = leaf.shape[0]
        flat = jnp.reshape(leaf, (n, -1))
        spans.append((i, len(cols), flat.shape[1]))
        cols.extend(flat[:, f] for f in range(flat.shape[1]))

    if cols:
        expanded = expand_cols(tuple(cols), cum_counts)
        for i, first, width in spans:
            leaf_cols = expanded[first : first + width]
            rebuilt = (
                leaf_cols[0]
                if width == 1 and leaves[i].ndim == 1
                else jnp.reshape(
                    jnp.stack(leaf_cols, axis=1),
                    (leaf_cols[0].shape[0],) + leaves[i].shape[1:],
                )
            )
            out[i] = rebuilt

    return jtu.tree_unflatten(treedef, out)
