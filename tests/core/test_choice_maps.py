"""ChoiceMap/Selection algebra tests, including hypothesis property tests
(parity: reference tests/core/test_choice_maps.py strategy)."""

import jax.numpy as jnp
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genjax_tpu import ChoiceMap, Mask, Selection
from genjax_tpu import ChoiceMapBuilder as C
from genjax_tpu import SelectionBuilder as S
from genjax_tpu.core.choice_map import ChoiceMapNoValueAtAddress

addr_component = st.text(
    alphabet="abcdefgh", min_size=1, max_size=3
)
values = st.floats(min_value=-100, max_value=100, allow_nan=False)


class TestSelection:
    def test_all_none_leaf(self):
        assert Selection.all()["anything"]
        assert not Selection.none()["anything"]
        leaf = Selection.leaf().extend("a", "b")
        assert leaf["a", "b"]
        assert not leaf["a", "b", "c"]

    def test_at_builder(self):
        sel = Selection.at["x", "y"]
        assert sel["x", "y"]
        assert not sel["x"]
        assert sel("x") == Selection.at["y"]
        assert sel("z") == Selection.none()

    def test_wildcard(self):
        sel = Selection.at[..., "y"]
        assert sel["anything", "y"]
        assert not sel["anything", "z"]

    def test_complement(self):
        sel = ~Selection.at["x", "y"]
        assert not sel["x", "y"]
        assert sel["z"]
        assert ~~Selection.at["x"] == Selection.at["x"]
        assert ~Selection.all() == Selection.none()
        assert ~Selection.none() == Selection.all()

    def test_and_or(self):
        s1 = S["x"] | S["y"]
        s2 = S["y"] | S["z"]
        both = s1 & s2
        assert both["y"]
        assert not both["x"]
        assert not both["z"]
        either = S["x"] | S["y"]
        assert either["x"] and either["y"] and not either["z"]

    def test_simplifications(self):
        assert (Selection.all() & S["x"]) == S["x"]
        assert (Selection.none() | S["x"]) == S["x"]
        assert (Selection.all() | S["x"]) == Selection.all()
        assert (Selection.none() & S["x"]) == Selection.none()

    def test_in_operator(self):
        sel = Selection.at["a", "b"]
        assert ("a", "b") in sel
        assert "a" not in sel


class TestChoiceMapBasics:
    def test_choice(self):
        chm = ChoiceMap.choice(42.0)
        assert chm.get_value() == 42.0
        assert chm.has_value()

    def test_empty(self):
        assert ChoiceMap.empty().static_is_empty()
        assert not ChoiceMap.empty().has_value()

    def test_builder(self):
        chm = C["x"].set(3.0)
        assert chm["x"] == 3.0
        chm = C["x", "y"].set(3.0)
        assert chm["x", "y"] == 3.0
        assert chm("x")["y"] == 3.0

    def test_kw_and_d(self):
        chm = ChoiceMap.kw(x=1.0, y=2.0)
        assert chm["x"] == 1.0 and chm["y"] == 2.0
        chm = ChoiceMap.d({"a": 1.0, "b": {"c": 2.0}})
        assert chm["b", "c"] == 2.0

    def test_missing_value_raises(self):
        chm = C["x"].set(1.0)
        with pytest.raises(ChoiceMapNoValueAtAddress):
            chm["zzz"]

    def test_contains(self):
        chm = C["x", "y"].set(1.0)
        assert ("x", "y") in chm
        assert "x" not in chm  # no value AT "x", only below it

    def test_from_mapping(self):
        chm = ChoiceMap.from_mapping([("x", 1.0), (("y", "z"), 2.0)])
        assert chm["x"] == 1.0
        assert chm["y", "z"] == 2.0

    def test_at_update(self):
        chm = ChoiceMap.d({"x": 5.0, "y": {"z": 10.0}})
        updated = chm.at["y", "z"].update(lambda v: v * 2)
        assert updated["y", "z"] == 20.0
        added = chm.at["w"].update(lambda _: 42.0)
        assert added["w"] == 42.0


class TestChoiceMapCombinators:
    def test_or_priority(self):
        chm = ChoiceMap.choice(5.0) | ChoiceMap.choice(10.0)
        assert chm.get_value() == 5.0

    def test_merge_disjoint(self):
        chm = C["x"].set(5.0) | C["y"].set(10.0)
        assert chm["x"] == 5.0 and chm["y"] == 10.0

    def test_filter_static(self):
        chm = ChoiceMap.kw(x=1.0, y=2.0)
        filtered = chm.filter(S["x"])
        assert "x" in filtered and "y" not in filtered

    def test_filter_flag(self):
        chm = ChoiceMap.kw(x=1.0)
        masked = chm.mask(False)
        assert masked.static_is_empty() or not masked.has_value()
        masked_t = chm.mask(True)
        assert masked_t["x"] == 1.0

    def test_filter_dynamic_flag(self):
        chm = ChoiceMap.kw(x=1.0)
        masked = chm.mask(jnp.array(False))
        v = masked("x").get_value()
        assert isinstance(v, Mask)
        assert not bool(v.primal_flag())

    def test_and(self):
        c1 = ChoiceMap.kw(x=1.0, y=2.0)
        c2 = ChoiceMap.kw(y=5.0, z=6.0)
        out = c1 & c2
        assert "y" in out and out["y"] == 5.0
        assert "z" not in out

    def test_extend(self):
        chm = ChoiceMap.choice(1.0).extend("a", "b")
        assert chm["a", "b"] == 1.0

    def test_get_selection(self):
        chm = C["x", "y"].set(3.0) | C["z"].set(5.0)
        sel = chm.get_selection()
        assert sel["x", "y"]
        assert sel["z"]
        assert not sel["w"]


class TestIndexedChoiceMaps:
    def test_scalar_dynamic_address(self):
        chm = ChoiceMap.entry(jnp.array([1.1, 2.2, 3.3]), jnp.array([1, 2, 3]))
        v = chm(2).get_value()
        assert isinstance(v, Mask)
        assert bool(v.primal_flag())
        assert jnp.allclose(v.value, 2.2)

    def test_missing_dynamic_address(self):
        chm = ChoiceMap.entry(jnp.array([1.1, 2.2]), jnp.array([4, 5]))
        v = chm(0).get_value()
        assert isinstance(v, Mask)
        assert not bool(v.primal_flag())

    def test_scalar_index_extend(self):
        chm = ChoiceMap.choice(7.0).extend(jnp.array(3))
        v3 = chm(3).get_value()
        assert isinstance(v3, Mask) and bool(v3.primal_flag())
        v1 = chm(1).get_value()
        assert v1 is None or (isinstance(v1, Mask) and not bool(v1.primal_flag()))


class TestSwitchChoiceMaps:
    def test_concrete_switch(self):
        chm1 = ChoiceMap.kw(x=1.0)
        chm2 = ChoiceMap.kw(x=3.0)
        out = ChoiceMap.switch(1, [chm1, chm2])
        assert out["x"] == 3.0

    def test_traced_switch(self):
        chm1 = ChoiceMap.d({"x": 1.0, "y": 2.0})
        chm2 = ChoiceMap.d({"x": 3.0, "y": 4.0})
        chm3 = ChoiceMap.d({"x": 5.0, "y": 6.0})
        out = ChoiceMap.switch(jnp.array(1), [chm1, chm2, chm3])
        assert jnp.allclose(out["x"].unmask(), 3.0)
        assert jnp.allclose(out["y"].unmask(), 4.0)


class TestHypothesisAlgebra:
    @settings(max_examples=25, deadline=None)
    @given(addr_component, values)
    def test_set_get_roundtrip(self, addr, v):
        chm = C[addr].set(v)
        assert jnp.isclose(jnp.asarray(chm[addr], dtype=jnp.float32), jnp.float32(v))

    @settings(max_examples=25, deadline=None)
    @given(addr_component, addr_component, values, values)
    def test_or_left_priority(self, a1, a2, v1, v2):
        chm = C[a1].set(v1) | C[a2].set(v2)
        assert jnp.isclose(jnp.asarray(chm[a1], dtype=jnp.float32), jnp.float32(v1))

    @settings(max_examples=25, deadline=None)
    @given(addr_component, values)
    def test_filter_complement_empty(self, addr, v):
        chm = C[addr].set(v)
        sel = chm.get_selection()
        assert addr not in chm.filter(~sel)
        assert addr in chm.filter(sel)


class TestSubtreeSelection:
    """S[path] covers the whole subtree under path (reference
    choice_map.py:112-117) — regression for the leaf-only bug where
    project/Regenerate over a submodel address silently selected
    nothing."""

    def test_project_submodel_subtree(self):
        import jax

        import genjax_tpu as gx

        @gx.gen
        def inner():
            return gx.normal(0.0, 1.0) @ "x"

        @gx.gen
        def outer():
            return inner() @ "f"

        tr = outer.simulate(jax.random.key(0), ())
        w = tr.project(jax.random.key(1), S["f"])
        assert jnp.allclose(w, tr.get_score())

    def test_filter_submodel_subtree(self):
        chm = ChoiceMap.d({("f", "x"): 1.0, ("f", "y"): 2.0, "z": 3.0})
        kept = chm.filter(S["f"])
        assert ("f", "x") in kept and ("f", "y") in kept
        assert "z" not in kept
        dropped = chm.filter(~S["f"])
        assert "z" in dropped and ("f", "x") not in dropped


class TestSwitchHuskCollapse:
    """A Switch node whose every branch is statically empty holds no
    choices; filter/get_inner_map must collapse it, or downstream edit
    handlers treat the husk as a real constraint (round-4 fix, caught by
    the structural fuzzer on mask(mix(...)) flag flips)."""

    def test_static_is_empty_recurses(self):
        from genjax_tpu.core.choice_map import Switch

        husk = Switch(jnp.int32(0), [ChoiceMap.empty(), ChoiceMap.empty()])
        assert husk.static_is_empty()

    def test_filter_collapses_to_empty(self):
        chm = ChoiceMap.switch(
            jnp.int32(0),
            [C["v"].set(1.0), C["u"].set(2.0)],
        )
        kept = chm.filter(Selection.at["other"])
        assert kept.static_is_empty()

    def test_filter_under_static_prunes_entry(self):
        chm = C["mk"].set(
            ChoiceMap.switch(jnp.int32(0), [C["v"].set(1.0), C["u"].set(2.0)])
        ) | C["on"].set(True)
        kept = chm.filter(Selection.at["on"])
        # the 'mk' husk is pruned entirely
        assert set(kept.children.keys()) == {"on"}

    def test_nonempty_branch_not_collapsed(self):
        chm = ChoiceMap.switch(
            jnp.int32(0), [C["v"].set(1.0), ChoiceMap.empty()]
        )
        assert not chm.static_is_empty()
        assert chm("v").get_value() is not None
