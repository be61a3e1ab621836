"""Tests for the Pytree dataclass base (parity: reference
tests/core/test_pytree.py idioms)."""

import dataclasses

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from genjax_tpu import Closure, Const, Pytree, nth


@Pytree.dataclass
class Simple(Pytree):
    x: jnp.ndarray
    n: int = Pytree.static()


@Pytree.dataclass
class Nested(Pytree):
    inner: Simple
    y: jnp.ndarray


class TestPytreeDataclass:
    def test_flatten_unflatten_roundtrip(self):
        p = Simple(jnp.arange(3.0), 7)
        leaves, treedef = jtu.tree_flatten(p)
        assert len(leaves) == 1
        p2 = jtu.tree_unflatten(treedef, leaves)
        assert p2.n == 7
        assert jnp.array_equal(p2.x, p.x)

    def test_static_field_in_treedef(self):
        p1 = Simple(jnp.zeros(2), 1)
        p2 = Simple(jnp.zeros(2), 2)
        assert jtu.tree_structure(p1) != jtu.tree_structure(p2)

    def test_jit_through_pytree(self):
        @jax.jit
        def f(p: Simple):
            return p.x * p.n

        out = f(Simple(jnp.ones(4), 3))
        assert jnp.array_equal(out, 3.0 * jnp.ones(4))

    def test_vmap_over_pytree(self):
        batched = Simple(jnp.arange(6.0).reshape(3, 2), 5)
        out = jax.vmap(lambda p: jnp.sum(p.x))(batched)
        assert out.shape == (3,)

    def test_nested(self):
        n = Nested(Simple(jnp.ones(2), 3), jnp.zeros(4))
        leaves = jtu.tree_leaves(n)
        assert len(leaves) == 2

    def test_eq(self):
        assert Simple(jnp.ones(2), 3) == Simple(jnp.ones(2), 3)
        assert Simple(jnp.ones(2), 3) != Simple(jnp.zeros(2), 3)
        assert Simple(jnp.ones(2), 3) != Simple(jnp.ones(2), 4)

    def test_match_args(self):
        match Simple(jnp.ones(2), 3):
            case Simple(x, n):
                assert n == 3
            case _:
                pytest.fail("match_args broken")


class TestConst:
    def test_const_is_static(self):
        c = Const(42)
        assert jtu.tree_leaves(c) == []
        assert c.unwrap() == 42

    def test_const_through_jit(self):
        @jax.jit
        def f(c: Const):
            return jnp.zeros(c.unwrap())

        assert f(Const(5)).shape == (5,)

    def test_tree_const(self):
        wrapped = Pytree.tree_const({"a": 1, "b": 2})
        unwrapped = Pytree.tree_const_unwrap(wrapped)
        assert unwrapped == {"a": 1, "b": 2}


class TestClosure:
    def test_closure_call(self):
        clo = Closure((2.0,), lambda a, b: a + b)
        assert clo(3.0) == 5.0

    def test_closure_dynamic_args_traced(self):
        clo = Closure((jnp.array(2.0),), lambda a, b: a * b)

        @jax.jit
        def f(c: Closure, x):
            return c(x)

        assert f(clo, 3.0) == 6.0

    def test_partial_decorator(self):
        @Pytree.partial(10.0)
        def f(a, b):
            return a - b

        assert f(4.0) == 6.0

    def test_same_code_closures_share_treedef(self):
        # Re-executing the same source line mints a fresh function
        # OBJECT; the treedef must still compare equal (code + closure
        # cells), or re-traced in-body callees would change a trace's
        # treedef under edit (see lang tests, TestEditTreedefStability).
        def mk(c):
            def f(x):
                return x + c

            return Closure((), f)

        td = lambda v: jax.tree_util.tree_structure(v)
        assert td(mk(1.0)) == td(mk(1.0))  # same code, same cell
        assert td(mk(1.0)) != td(mk(2.0))  # same code, DIFFERENT cell
        assert hash(td(mk(1.0))) == hash(td(mk(1.0)))

        def mk2(c):
            def f(x):
                return x * c

            return Closure((), f)

        assert td(mk(1.0)) != td(mk2(1.0))  # different code


def test_nth():
    tree = {"a": jnp.arange(5), "b": jnp.arange(10.0).reshape(5, 2)}
    row = nth(tree, 2)
    assert row["a"] == 2
    assert row["b"].shape == (2,)
