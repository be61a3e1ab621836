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

Each phase is up to ceil(log2(N)) roll+select passes; stages above the
runtime displacement bound are skipped via `lax.cond`, so near-uniform
weights (small displacements / short runs) cost only a few passes.

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


def _gated(pred, body, carry):
    return jax.lax.cond(pred, body, lambda c: c, carry)


def _route_right(rows, rem, n: int):
    """Move rows toward higher lanes by their exact remaining displacement
    `rem` (one-sided, non-decreasing over occupied lanes; rem < 0 marks an
    empty lane), via MSB-first binary hops. Conflict-free: the c-th row's
    intermediate position c + high_k(delta_c) is strictly increasing in c
    because high_k is monotone in delta. Rows move by the exact bit
    decomposition of their displacement."""
    n_stages = max(1, (n - 1).bit_length())
    max_rem = jnp.max(rem)
    for k in reversed(range(n_stages)):
        hop = 1 << k

        def stage(carry, hop=hop):
            rows, rem = carry
            src_rows = jnp.roll(rows, hop, axis=0)
            src_rem = jnp.roll(rem, hop)
            incoming = (src_rem >= 0) & ((src_rem & hop) != 0)
            # A lane never both keeps a finished row and receives one
            # (conflict-freedom above), so the two selects can't clash.
            vacated = (rem >= 0) & ((rem & hop) != 0)
            new_rows = jnp.where(incoming[:, None], src_rows, rows)
            new_rem = jnp.where(
                incoming, src_rem - hop, jnp.where(vacated, -1, rem)
            )
            return new_rows, new_rem

        rows, rem = _gated(max_rem >= hop, stage, (rows, rem))
    return rows, rem


def _fill_forward(rows, marked, max_run, n: int):
    """Copy each marked lane's row rightward across its run (to every lane
    whose nearest marked lane at-or-before it is that one), by pointer
    doubling on (row, source-index)."""
    n_stages = max(1, (n - 1).bit_length())
    iota = jnp.arange(n, dtype=jnp.int32)
    src = jnp.where(marked, iota, -1)
    for k in range(n_stages):
        hop = 1 << k

        def stage(carry, hop=hop):
            rows, src = carry
            cand_rows = jnp.roll(rows, hop, axis=0)
            cand_src = jnp.where(iota >= hop, jnp.roll(src, hop), -1)
            take = cand_src > src
            return jnp.where(take[:, None], cand_rows, rows), jnp.maximum(
                src, cand_src
            )

        rows, src = _gated(max_run > hop, stage, (rows, src))
    return rows


def expand_rows_packed(x, cum_counts: IntArray):
    """Expand a packed (N, F) matrix by cumulative block counts: output
    slot i gets row j where N_{j-1} <= i < N_j. Exactly `x[anc]` for the
    systematic/stratified ancestor vector derived from `cum_counts`."""
    n = x.shape[0]
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
    _, start_at, live, *cols = jax.lax.sort(
        (key1, starts, survive.astype(jnp.int32))
        + tuple(x[:, f] for f in range(x.shape[1])),
        num_keys=1,
    )
    rows = jnp.stack(cols, axis=1) if len(cols) > 1 else cols[0][:, None]

    # Phase 2 — spread rank-c survivor right to its block start t_c
    # (t_c - c is one-sided non-decreasing). rem < 0 marks empty lanes.
    rem = jnp.where(live > 0, start_at - iota, -1)
    rows, rem = _route_right(rows, rem, n)

    # Phase 3 — fill each block forward across its run.
    return _fill_forward(rows, rem == 0, jnp.max(counts), n)


def expand_rows(tree, cum_counts: IntArray, n_rows: int | None = None):
    """`take_rows(tree, anc)` for the monotone ancestors encoded by
    `cum_counts`, lowered as streaming passes instead of a per-index
    gather. Leaves whose leading dim differs from `n_rows` pass through
    untouched (shared model args), matching `take_rows` semantics."""
    from genjax_tpu.core.gather import _packable

    leaves, treedef = jtu.tree_flatten(tree)
    if not leaves:
        return tree
    cum_counts = jnp.asarray(cum_counts)
    out: list = [None] * len(leaves)
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        ndim = getattr(leaf, "ndim", 0)
        if n_rows is not None and (ndim == 0 or jnp.shape(leaf)[0] != n_rows):
            out[i] = leaf
        elif _packable(leaf) and ndim >= 1:
            groups.setdefault(jnp.result_type(leaf), []).append(i)
        else:
            raise TypeError(f"expand_rows: unsupported leaf {type(leaf)}")

    for dtype, members in groups.items():
        n = leaves[members[0]].shape[0]
        flats, widths = [], []
        for i in members:
            f = jnp.reshape(leaves[i], (n, -1))
            flats.append(f)
            widths.append(f.shape[1])
        packed = flats[0] if len(flats) == 1 else jnp.concatenate(flats, axis=1)
        expanded = expand_rows_packed(packed, cum_counts)
        offsets = np.concatenate([[0], np.cumsum(widths)])
        for k, i in enumerate(members):
            segment = expanded[:, offsets[k] : offsets[k + 1]]
            out[i] = jnp.reshape(segment, (n,) + leaves[i].shape[1:])

    return jtu.tree_unflatten(treedef, out)
