"""Staging utility tests (parity: reference tests/core/test_staging.py):
FlagOp algebra, tree_choose, multi_switch, to_shape_fn/empty_trace."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import FlagOp, multi_switch, to_shape_fn, tree_choose


class TestFlagOp:
    def test_concrete_shortcuts(self):
        assert FlagOp.and_(True, False) is False
        assert FlagOp.or_(True, False) is True
        assert FlagOp.xor_(True, True) is False
        assert FlagOp.not_(True) is False
        assert FlagOp.concrete_true(True)
        assert FlagOp.concrete_false(False)
        assert not FlagOp.concrete_true(jnp.array(True))

    def test_traced(self):
        t = jnp.array(True)
        f = jnp.array(False)
        assert bool(FlagOp.and_(t, f)) is False
        assert bool(FlagOp.or_(t, f)) is True
        assert bool(FlagOp.xor_(t, f)) is True
        assert bool(FlagOp.not_(t)) is False

    def test_where_and_cond(self):
        assert FlagOp.where(True, 1.0, 2.0) == 1.0
        assert FlagOp.where(False, 1.0, 2.0) == 2.0
        assert jnp.allclose(FlagOp.where(jnp.array(True), 1.0, 2.0), 1.0)
        assert FlagOp.cond(True, lambda x: x + 1, lambda x: x - 1, 1.0) == 2.0
        assert jnp.allclose(
            FlagOp.cond(jnp.array(False), lambda x: x + 1, lambda x: x - 1, 1.0),
            0.0,
        )


class TestTreeChoose:
    def test_concrete_idx(self):
        out = tree_choose(1, [{"a": 1.0}, {"a": 2.0}, {"a": 3.0}])
        assert out["a"] == 2.0

    def test_traced_idx(self):
        out = tree_choose(jnp.array(2), [{"a": 1.0}, {"a": 2.0}, {"a": 3.0}])
        assert jnp.allclose(out["a"], 3.0)

    def test_wraps_out_of_range(self):
        out = tree_choose(jnp.array(4), [1.0, 2.0, 3.0])
        assert jnp.allclose(out, 2.0)  # 4 mod 3 == 1

    def test_dtype_promotion(self):
        out = tree_choose(jnp.array(0), [True, 2])
        assert out.dtype == jnp.int32


class TestMultiSwitch:
    def test_different_shapes(self):
        def f0(x):
            return jnp.zeros(2) + x

        def f1(x):
            return (jnp.zeros(3) + x, x)

        results = multi_switch(jnp.array(0), [f0, f1], [(1.0,), (2.0,)])
        assert results[0].shape == (2,)
        assert jnp.allclose(results[0], 1.0)
        # non-selected slot holds zero-filled template
        assert jnp.allclose(results[1][0], 0.0)

        results = multi_switch(jnp.array(1), [f0, f1], [(1.0,), (2.0,)])
        assert jnp.allclose(results[1][0], 2.0)


class TestShapeFns:
    def test_to_shape_fn(self):
        shaped = to_shape_fn(lambda x: (x * 2, jnp.zeros(3)), jnp.ones)(1.0)
        assert shaped[0] == 1.0  # filled with ones
        assert shaped[1].shape == (3,)

    def test_empty_trace_zero_flops(self):
        @g.gen
        def model():
            x = g.normal(0.0, 1.0) @ "x"
            return x * 2

        zt = model.get_zero_trace()
        assert jnp.allclose(zt.get_score(), 0.0)
        assert jnp.allclose(zt.get_choices()["x"], 0.0)


class TestDiff:
    def test_tree_helpers(self):
        from genjax_tpu import Diff, NoChange, UnknownChange

        d = Diff.unknown_change((1.0, 2.0))
        assert not Diff.static_check_no_change(d)
        assert Diff.tree_primal(d) == (1.0, 2.0)
        d2 = Diff.no_change(d)
        assert Diff.static_check_no_change(d2)
        assert Diff.static_check_tree_diff(d2)
        mixed = (Diff(1.0, NoChange), Diff(2.0, UnknownChange))
        assert not Diff.static_check_no_change(mixed)
        tangents = Diff.tree_tangent(mixed)
        assert tangents[0] is NoChange
