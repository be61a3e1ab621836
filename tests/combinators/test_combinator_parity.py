"""Combinator/core parity pins (reference
tests/core/generative/test_core.py, test_scan_combinator.py:
test_zero_length_scan/test_scan_validation/test_vmap_key_scan,
test_vmap_combinator.py: validation/nested-indexed/zero-length,
test_switch_combinator.py: vectorized access / empty branches /
heterogeneous retvals): subtrace navigation through every combinator,
length-0 vector combinators, broadcast validation errors, and
vmapping whole GFI calls over keys."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu import Selection

C = g.ChoiceMapBuilder
KEY = jax.random.key(0)


class TestSubtraceNavigation:
    """Reference test_core.py:56-166 — get_subtrace addresses through
    static nesting, or_else/switch, vmap, and scan."""

    def test_project_agrees_with_subtrace_scores(self):
        @g.gen
        def f():
            x = g.normal(0.0, 1.0) @ "x"
            y = g.normal(0.0, 1.0) @ "y"
            return x, y

        tr = f.simulate(KEY, ())
        x_score = tr.project(jax.random.key(1), Selection.at["x"])
        assert jnp.allclose(x_score, tr.get_subtrace("x").get_score())
        y_score = tr.project(jax.random.key(1), Selection.at["y"])
        assert jnp.allclose(y_score, tr.get_subtrace("y").get_score())
        assert jnp.allclose(tr.get_score(), x_score + y_score)

    def test_tupled_address_project(self):
        @g.gen
        def f():
            x = g.normal(0.0, 1.0) @ ("x", "x0")
            return g.normal(x, 1.0) @ "y"

        tr = f.simulate(KEY, ())
        v = tr.get_choices()["x", "x0"]
        x_score, _ = g.normal.assess(g.ChoiceMap.choice(v), (0.0, 1.0))
        assert jnp.allclose(
            x_score, tr.project(jax.random.key(1), Selection.at["x", "x0"])
        )

    def test_nested_varargs_subtrace(self):
        @g.gen
        def f():
            x = g.normal(0.0, 1.0) @ "x"
            y = g.normal(0.0, 1.0) @ "y"
            return x + y

        @g.gen
        def gmid():
            return f() @ "f"

        @g.gen
        def h():
            return gmid() @ "g"

        tr = h.simulate(jax.random.key(2), ())
        a = tr.get_subtrace("g").get_subtrace("f").get_subtrace("x")
        b = tr.get_subtrace("g", "f", "x")
        c = tr.get_subtrace("g").get_subtrace("f", "x")
        assert a.get_score() == b.get_score() == c.get_score()

    def test_subtrace_through_or_else(self):
        @g.gen
        def f():
            return g.normal(0.0, 0.01) @ "x"

        @g.gen
        def other():
            return g.uniform(10.0, 11.0) @ "y"

        @g.gen
        def h():
            fl = g.flip(0.5) @ "flip"
            return g.or_else(f, other)(fl, (), ()) @ "z"

        tr = h.simulate(KEY, ())
        flip_tr = tr.get_subtrace("flip")
        addr = "x" if bool(flip_tr.get_retval()) else "y"
        assert jnp.allclose(
            tr.get_subtrace("z", addr).get_score(),
            tr.get_score() - flip_tr.get_score(),
            atol=1e-6,
        )

    def test_subtrace_through_vmap(self):
        @g.gen
        def f(x):
            return g.normal(x, 0.01) @ "y"

        tr = f.vmap(in_axes=(0,)).simulate(KEY, (jnp.arange(5.0),))
        sub = tr.get_subtrace("y")
        assert sub.get_score().shape == (5,)
        assert jnp.allclose(tr.get_score(), jnp.sum(sub.get_score()))

    def test_subtrace_through_scan(self):
        @g.gen
        def f(state, step):
            return state + g.normal(step, 0.01) @ "y", None

        tr = f.scan().simulate(KEY, (5.0, jnp.arange(3.0)))
        sub = tr.get_subtrace("y")
        assert sub.get_score().shape == (3,)
        assert jnp.allclose(tr.get_score(), jnp.sum(sub.get_score()))


class TestZeroLengthCombinators:
    def test_zero_length_scan_explicit_n(self):
        @g.gen
        def step(state, sigma):
            new_x = g.normal(state, sigma) @ "x"
            return new_x, new_x + 1

        tr = step.scan(n=0).simulate(
            KEY, (2.0, jnp.arange(0, dtype=float))
        )
        assert jnp.allclose(tr.get_score(), 0.0)
        assert tr.get_retval()[0] == 2.0
        # Zero-length importance with the (empty) choices round-trips.
        _, w = step.scan().importance(
            jax.random.key(1),
            tr.get_choices(),
            (2.0, jnp.arange(0, dtype=float)),
        )
        assert jnp.allclose(w, 0.0)

    def test_zero_length_scan_none_xs(self):
        @g.gen
        def step(c, _x):
            return c + (g.normal(0.0, 1.0) @ "z"), None

        tr = step.scan(n=0).simulate(KEY, (1.0, None))
        assert jnp.allclose(tr.get_score(), 0.0)
        assert tr.get_retval()[0] == 1.0

    def test_zero_length_repeat(self):
        @g.gen
        def f():
            return g.normal(0.0, 1.0) @ "x"

        tr = f.repeat(n=0).simulate(KEY, ())
        assert tr.get_retval().shape == (0,)
        assert jnp.allclose(tr.get_score(), 0.0)


class TestValidation:
    def test_scan_mismatched_leading_axes(self):
        @g.gen
        def foo(shift, d):
            x = g.normal(d["loc"], d["scale"]) @ "x"
            return x + shift, None

        d = {"loc": jnp.array([10.0, 12.0]), "scale": jnp.array([1.0])}
        with pytest.raises(ValueError, match="different leading axis sizes"):
            jax.jit(foo.scan().simulate)(KEY, (jnp.array([1.0]), d))

    def test_vmap_rank_too_low(self):
        @g.gen
        def foo(loc, scale):
            return g.normal(loc, scale) @ "x"

        with pytest.raises(ValueError):
            jax.jit(foo.vmap(in_axes=(0, None)).simulate)(
                KEY, (10.0, jnp.arange(3.0))
            )

    def test_vmap_mismatched_batch_sizes(self):
        @g.gen
        def foo(loc, scale):
            return g.normal(loc, scale) @ "x"

        with pytest.raises(Exception):
            jax.jit(foo.vmap(in_axes=(0, 0)).simulate)(
                KEY, (jnp.arange(2.0), jnp.arange(3.0))
            )


class TestKeyBatching:
    """GFI calls are ordinary JAX programs: mapping over keys composes
    with the combinators (reference test_vmap_key_scan/test_vmap_key_vmap)."""

    def test_vmap_keys_over_scan(self):
        @g.gen
        def model(x, _):
            return (g.normal(x, 1.0) @ "y"), None

        sc = model.scan()
        args = (jnp.array(1.0), jnp.arange(5.0))
        trs = jax.vmap(lambda k: sc.simulate(k, args))(
            jax.random.split(KEY, 10)
        )
        assert trs.get_score().shape == (10,)
        ys = trs.get_choices()[..., "y"]
        assert ys.shape == (10, 5)
        # distinct keys -> distinct samples
        assert not jnp.allclose(ys[0], ys[1])

    def test_vmap_keys_over_vmap(self):
        @g.gen
        def m(x):
            return g.normal(x, 1.0) @ "y"

        vm = m.vmap(in_axes=(0,))
        trs = jax.vmap(lambda k: vm.simulate(k, (jnp.arange(3.0),)))(
            jax.random.split(KEY, 4)
        )
        assert trs.get_score().shape == (4,)


class TestVectorizedConstraints:
    def test_nested_indexed_choice_map_importance(self):
        @g.gen
        def inner(x):
            return g.normal(x, 1.0) @ "q"

        @g.gen
        def outer(x):
            return inner(x) @ "sub"

        vm = outer.vmap(in_axes=(0,))
        chm = C[1, "sub", "q"].set(5.0)
        tr, w = vm.importance(KEY, chm, (jnp.zeros(3),))
        assert jnp.allclose(tr.get_choices()[1, "sub", "q"], 5.0)
        # weight is exactly the constrained lane's density
        lp = -0.5 * 25.0 - 0.5 * jnp.log(2 * jnp.pi)
        assert jnp.allclose(w, lp, atol=1e-5)

    def test_switch_under_vmap_vectorized_access(self):
        @g.gen
        def ba():
            return g.normal(0.0, 1.0) @ "v"

        @g.gen
        def bb():
            return g.normal(5.0, 1.0) @ "v"

        sw = g.switch(ba, bb)
        vsw = sw.vmap(in_axes=(0, None, None))
        idxs = jnp.array([0, 1, 0, 1])
        tr = vsw.simulate(KEY, (idxs, (), ()))
        # Both branches trace "v", so the per-lane value is a Mask whose
        # flag is True on every lane (the live branch always provides it).
        vs = tr.get_choices()[..., "v"]
        assert jnp.all(vs.primal_flag())
        assert vs.value.shape == (4,)
        assert jnp.allclose(tr.get_retval(), vs.value)


class TestSwitchShapes:
    def test_switch_with_choice_free_branch(self):
        @g.gen
        def empty_branch():
            return 0.0

        @g.gen
        def full_branch():
            return g.normal(0.0, 1.0) @ "v"

        sw = g.switch(empty_branch, full_branch)
        t0 = sw.simulate(KEY, (jnp.array(0), (), ()))
        assert jnp.allclose(t0.get_score(), 0.0)
        t1 = sw.simulate(KEY, (jnp.array(1), (), ()))
        assert t1.get_score() != 0.0

    def test_switch_heterogeneous_retval_shapes(self):
        @g.gen
        def rt_a():
            return (g.normal(0.0, 1.0) @ "v", 1.0)

        @g.gen
        def rt_b():
            return (g.normal(0.0, 1.0) @ "w", jnp.zeros(3))

        sw = g.switch(rt_a, rt_b)
        tr = sw.simulate(KEY, (jnp.array(1), (), ()))
        shapes = jax.tree_util.tree_map(jnp.shape, tr.get_retval())
        assert shapes == ((), (3,))
