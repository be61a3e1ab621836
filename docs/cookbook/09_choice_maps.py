"""Cookbook: the ChoiceMap and Selection algebra.

Mirrors the reference cookbook's choice-map deep dive
(active/choice_maps.ipynb topics): builders, nesting, merging with
priority, filtering with selections, dynamic (integer-array) addresses,
masks, and the two views of vectorized traces.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap, Mask
from genjax_tpu import ChoiceMapBuilder as C
from genjax_tpu import SelectionBuilder as S
from genjax_tpu import gen, normal


def main():
    # --- construction: builders, kw/d, nesting ---
    chm = C["x"].set(1.0)
    assert chm["x"] == 1.0

    nested = C["outer", "inner"].set(2.0)
    assert nested["outer", "inner"] == 2.0
    assert nested("outer")["inner"] == 2.0  # descend one level

    by_kw = ChoiceMap.kw(a=1.0, b=2.0)
    by_dict = ChoiceMap.d({"a": 1.0, ("sub", "b"): 2.0})
    assert by_kw["a"] == by_dict["a"]

    # --- merging: `|` is left-prioritized union ---
    merged = C["x"].set(1.0) | C["x"].set(99.0) | C["y"].set(3.0)
    assert merged["x"] == 1.0  # left wins
    assert merged["y"] == 3.0
    # Heterogeneous overlap (leaf vs subtree) also resolves lazily:
    odd = C["p"].set(1.0) | C["p", "q"].set(2.0)
    assert odd["p"] == 1.0

    # --- selections: an address-set algebra ---
    sel = S["x"] | S["sub", "y"]
    assert "x" in sel and ("sub", "y") in sel and "z" not in sel
    assert "x" not in ~sel

    # filtering splits a choice map into kept / dropped parts
    chm = ChoiceMap.d({"x": 1.0, "z": 2.0, ("sub", "y"): 3.0})
    kept = chm.filter(sel)
    dropped = chm.filter(~sel)
    assert "x" in kept and "z" not in kept
    assert "z" in dropped and "x" not in dropped

    # --- dynamic (integer-array) addresses ---
    # Constraints at runtime-computed indices store densely and answer
    # membership with Mask flags (a gather, not a trie walk).
    idxs = jnp.array([2, 5])
    vals = jnp.array([10.0, 20.0])
    dyn = C[idxs, "v"].set(vals)
    hit = dyn.get_submap(5, "v").get_value()
    assert isinstance(hit, Mask) and bool(hit.primal_flag())
    assert float(hit.value) == 20.0
    miss = dyn.get_submap(3, "v").get_value()
    assert miss is None or not bool(miss.primal_flag())

    # --- vectorized traces: two views, one wildcard ---
    @gen
    def cell(mu):
        return normal(mu, 1.0) @ "w"

    batched = cell.vmap(in_axes=(0,))
    tr = batched.simulate(jax.random.key(0), (jnp.zeros(4),))
    chm = tr.get_choices()
    # Positional view: lane 2's w.
    lane2 = chm[2, "w"]
    # Structural view: every lane's w (leaves carry the batch axis).
    all_w = chm[..., "w"]
    assert all_w.shape == (4,)
    assert jnp.isclose(all_w[2], lane2)
    # `...` matches zero-or-one levels, so S[..., "w"] works for BOTH
    # filtering this trie AND regenerating through the vmap combinator.
    assert "w" not in chm.filter(~S[..., "w"])

    # --- masks: possibly-invalid values ---
    valid = Mask(1.0, jnp.asarray(True))
    invalid = Mask(7.0, jnp.asarray(False))
    assert float((invalid | valid).unmask()) == 1.0  # left-priority on validity
    assert float(invalid.unmask(default=-1.0)) == -1.0

    print("choice-map cookbook: all checks passed")


if __name__ == "__main__":
    main()
