"""Deep Mask algebra coverage (parity: reference
tests/core/generative/test_functional_types.py:27-367 — construction
validation, build/maybe_mask laws, full or/xor truth tables over vectorized
flags, invert, indexing through vectorized flags, checkified unmask)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from genjax_tpu import Mask
from genjax_tpu.checkify import do_checkify


def masks_equal(a: Mask, b: Mask) -> bool:
    vals = jtu.tree_map(lambda x, y: bool(jnp.all(x == y)), a.value, b.value)
    return all(jtu.tree_leaves(vals)) and bool(
        jnp.all(a.primal_flag() == b.primal_flag())
    )


class TestConstruction:
    def test_flag_defaults_true(self):
        m = Mask(42)
        assert m.value == 42
        assert m.flag is True

    def test_build_collapses_nested(self):
        nested = Mask.build(Mask.build(42, True), False)
        assert isinstance(nested, Mask)
        assert not isinstance(nested.value, Mask)
        assert nested.value == 42
        assert nested.flag is False

    def test_build_under_vmap_validates_prefix(self):
        # A (2,1)-shaped flag against scalar-per-lane values must fail
        # inside each vmap lane: lane flag shape (1,) is not a prefix of ().
        with pytest.raises(ValueError, match="does not cover the leading axes"):
            jax.vmap(Mask.build)(
                jnp.arange(2), jnp.array([[True], [False]], dtype=bool)
            )

    def test_build_vectorized_then_scalar_nest(self):
        v_mask = jax.vmap(Mask.build)(jnp.arange(10), jnp.ones(10, dtype=bool))
        nested = Mask.build(v_mask, False)
        assert jnp.array_equal(nested.value, jnp.arange(10))
        assert jnp.array_equal(
            nested.primal_flag(), jnp.zeros(10, dtype=bool)
        )
        # Concrete vs traced scalar outer flag agree.
        nested2 = Mask.build(v_mask, jnp.array(False))
        assert masks_equal(nested, nested2)

    def test_build_nonscalar_flag_shape_mismatch(self):
        v_mask = jax.vmap(Mask.build)(jnp.arange(10), jnp.ones(10, dtype=bool))
        with pytest.raises(AssertionError, match="shapes must agree"):
            Mask.build(v_mask, jnp.array([False, True]))

    def test_vector_flag_against_pytree_leaves(self):
        # Same leading dim across differing trailing shapes is fine.
        value = {"a": jnp.ones((3, 2)), "b": jnp.ones((3, 5))}
        m = Mask(value, jnp.zeros(3, dtype=bool))
        assert jnp.array_equal(m.primal_flag(), jnp.zeros(3, dtype=bool))
        # A leading dim that disagrees on one leaf is rejected.
        bad = {"a": jnp.ones((3, 2)), "b": jnp.ones((4, 2))}
        with pytest.raises(ValueError, match="does not cover the leading axes"):
            Mask(bad, jnp.zeros(3, dtype=bool))

    def test_maybe_mask_none_value_survives(self):
        out = Mask.maybe_mask(None, jnp.asarray(True))
        assert isinstance(out, Mask)
        assert out.value is None

    def test_maybe_mask_unwraps_existing_mask(self):
        m = Mask(42, True)
        assert Mask.maybe_mask(m, True) == 42
        assert Mask.maybe_mask(m, False) is None


class TestUnmask:
    def test_unmask_invalid_raises_under_checkify(self):
        invalid = Mask(42.0, jnp.asarray(False))
        with do_checkify():
            with pytest.raises(Exception):
                invalid.unmask()

    def test_unmask_valid_under_checkify(self):
        valid = Mask(42.0, jnp.asarray(True))
        with do_checkify():
            assert valid.unmask() == 42.0

    def test_unmask_pytree_default(self):
        tree = {"a": jnp.asarray(1.0), "b": [jnp.asarray(2.0), jnp.asarray(3.0)]}
        default = {"a": jnp.asarray(0.0), "b": [jnp.asarray(0.0), jnp.asarray(0.0)]}
        out = Mask(tree, jnp.asarray(False)).unmask(default=default)
        assert all(jtu.tree_leaves(jtu.tree_map(lambda x: x == 0.0, out)))
        out_valid = Mask(tree, jnp.asarray(True)).unmask(default=default)
        assert out_valid["a"] == 1.0 and out_valid["b"][1] == 3.0

    def test_unmask_vectorized_default_selects_lanes(self):
        m = Mask(jnp.arange(4.0), jnp.array([True, False, True, False]))
        out = m.unmask(default=jnp.full(4, -1.0))
        assert jnp.array_equal(out, jnp.array([0.0, -1.0, 2.0, -1.0]))


class TestOrXorTables:
    """The exhaustive concrete truth tables the reference pins
    (test_functional_types.py:154-227), plus vectorized-lane agreement."""

    def test_or_concrete_table(self):
        assert (Mask(42, True) | Mask(43, True)).value == 42
        assert (Mask(42, True) | Mask(43, False)).value == 42
        assert (Mask(42, False) | Mask(43, True)).value == 43
        assert (Mask(42, False) | Mask(43, False)).primal_flag() is False
        for f1 in (True, False):
            for f2 in (True, False):
                got = (Mask(1.0, f1) | Mask(2.0, f2)).primal_flag()
                assert bool(got) == (f1 or f2)

    def test_xor_concrete_table(self):
        assert (Mask(42, True) ^ Mask(43, False)).value == 42
        assert (Mask(42, False) ^ Mask(43, True)).value == 43
        for f1 in (True, False):
            for f2 in (True, False):
                got = (Mask(1.0, f1) ^ Mask(2.0, f2)).primal_flag()
                assert bool(got) == (f1 ^ f2)

    def test_vectorized_lanes_match_scalar_table(self):
        f1 = jnp.array([True, True, False, False])
        f2 = jnp.array([False, True, False, True])
        v1 = jnp.full(4, 42.0)
        v2 = jnp.full(4, 43.0)
        ored = Mask(v1, f1) | Mask(v2, f2)
        xored = Mask(v1, f1) ^ Mask(v2, f2)
        for lane in range(4):
            s_or = Mask(42.0, bool(f1[lane])) | Mask(43.0, bool(f2[lane]))
            s_xor = Mask(42.0, bool(f1[lane])) ^ Mask(43.0, bool(f2[lane]))
            assert bool(ored.primal_flag()[lane]) == bool(s_or.primal_flag())
            if bool(s_or.primal_flag()):
                assert float(ored.value[lane]) == s_or.value
            assert bool(xored.primal_flag()[lane]) == bool(s_xor.primal_flag())
            if bool(s_xor.primal_flag()):
                assert float(xored.value[lane]) == s_xor.value

    def test_or_xor_n(self):
        ms = [Mask(float(i), False) for i in range(3)] + [Mask(7.0, True)]
        assert Mask.or_n(*ms).value == 7.0
        assert bool(Mask.xor_n(*ms).primal_flag())

    def test_scalar_python_vs_array_value(self):
        m5, m6 = Mask(1.0, True), Mask(jnp.array(1.0), True)
        assert (m5 | m6).value == 1.0
        assert (m5 ^ m6).primal_flag() is False

    def test_mixed_scalar_array_shape_rejected(self):
        with pytest.raises(ValueError, match="matching leaf shapes"):
            Mask(jnp.asarray(1.0), True) | Mask(jnp.ones((2, 2)), True)
        # Vectorized value with scalar flag cannot combine with
        # vectorized-flag mask of the same value shape.
        with pytest.raises(ValueError, match="matching leaf shapes"):
            Mask(jnp.ones(2), jnp.array([True, False])) | Mask(
                jnp.ones((2, 2)), jnp.array(True)
            )


class TestInvertAndIndex:
    def test_invert_scalar_and_vector(self):
        assert (~Mask(1.0, True)).flag is False
        m = ~Mask(jnp.arange(2.0), jnp.array([True, False]))
        assert jnp.array_equal(m.primal_flag(), jnp.array([False, True]))
        assert jnp.array_equal(m.value, jnp.arange(2.0))

    def test_double_invert_is_identity(self):
        m = Mask(jnp.arange(2.0), jnp.array([True, False]))
        assert masks_equal(~(~m), m)

    def test_index_scalar_flag_full_path(self):
        m = Mask(jnp.array([[1, 2], [3, 4]]), True)
        assert m[0, 1].value == 2
        assert m[0, 1].primal_flag() is True

    def test_index_vector_flag_consumes_prefix(self):
        # Flag is per-row; a 2-component path applies only its first
        # component to the flag.
        m = Mask(jnp.array([[1, 2], [3, 4]]), jnp.array([True, False]))
        assert m[0, 1].value == 2
        assert bool(m[0, 1].primal_flag())
        assert m[1, 0].value == 3
        assert not bool(m[1, 0].primal_flag())
