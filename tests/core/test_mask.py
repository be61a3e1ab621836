"""Mask algebra tests (parity: reference
tests/core/generative/test_functional_types.py)."""

import jax.numpy as jnp
import pytest

from genjax_tpu import Mask


class TestMaskBasics:
    def test_build_and_flatten(self):
        assert Mask.build(3.0, True).flatten() == 3.0
        assert Mask.build(3.0, False).flatten() is None
        m = Mask.build(3.0, jnp.array(True))
        assert isinstance(m.flatten(), Mask)

    def test_build_nested_and(self):
        m = Mask.build(Mask.build(1.0, jnp.array(True)), jnp.array(False))
        assert not bool(m.primal_flag())

    def test_maybe_mask(self):
        assert Mask.maybe_mask(2.0, True) == 2.0
        assert Mask.maybe_mask(2.0, False) is None

    def test_unmask_default(self):
        m = Mask(3.0, jnp.array(False))
        assert m.unmask(default=9.0) == 9.0
        m2 = Mask(3.0, jnp.array(True))
        assert m2.unmask(default=9.0) == 3.0

    def test_no_mask_of_mask(self):
        with pytest.raises(AssertionError):
            Mask(Mask(1.0, True), True)

    def test_vectorized_flag_validation(self):
        Mask(jnp.zeros((3, 4)), jnp.array([True, False, True]))
        with pytest.raises(ValueError):
            Mask(jnp.zeros((4, 3)), jnp.array([True, False, True]))

    def test_getitem_vectorized(self):
        m = Mask(jnp.arange(3.0), jnp.array([True, False, True]))
        m1 = m[1]
        assert not bool(m1.primal_flag())
        assert m1.value == 1.0


class TestMaskCombinators:
    def test_or_concrete(self):
        a = Mask(1.0, True)
        b = Mask(2.0, True)
        assert (a | b).value == 1.0
        c = Mask(1.0, False)
        assert (c | b).value == 2.0

    def test_or_dynamic(self):
        a = Mask(jnp.asarray(1.0), jnp.array(False))
        b = Mask(jnp.asarray(2.0), jnp.array(True))
        out = a | b
        assert jnp.allclose(out.value, 2.0)
        assert bool(out.primal_flag())

    def test_xor(self):
        a = Mask(jnp.asarray(1.0), jnp.array(True))
        b = Mask(jnp.asarray(2.0), jnp.array(False))
        out = a ^ b
        assert jnp.allclose(out.value, 1.0)
        assert bool(out.primal_flag())

    def test_xor_both_true_invalid(self):
        a = Mask(jnp.asarray(1.0), jnp.array(True))
        b = Mask(jnp.asarray(2.0), jnp.array(True))
        assert not bool((a ^ b).primal_flag())

    def test_invert(self):
        m = ~Mask(1.0, jnp.array(True))
        assert not bool(m.primal_flag())

    def test_structure_mismatch_raises(self):
        with pytest.raises(ValueError):
            Mask((1.0, 2.0), jnp.array(True)) | Mask(
                (1.0, (2.0, 3.0)), jnp.array(True)
            )

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            Mask(jnp.zeros(2), jnp.array(True)) | Mask(jnp.zeros(3), jnp.array(True))
