"""GFI edge cases: tupled addresses, Mask-valued constraints, closure
sugar, kwargs, switch constraints."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Mask


class TestTupledAddresses:
    def test_trace_to_tuple_address(self):
        @g.gen
        def model():
            x = g.normal(0.0, 1.0) @ ("a", "b")
            return x

        tr = model.simulate(jax.random.key(0), ())
        chm = tr.get_choices()
        assert ("a", "b") in chm
        # subtrace stored under the full tuple
        sub = tr.get_inner_trace(("a", "b"))
        assert jnp.allclose(sub.get_retval(), chm["a", "b"])
        # constrain through the tuple address
        tr2, w = model.importance(
            jax.random.key(1), ChoiceMap.entry(1.5, "a", "b"), ()
        )
        assert jnp.allclose(tr2.get_choices()["a", "b"], 1.5)


class TestMaskedConstraints:
    def test_generate_with_masked_constraint(self):
        """A Mask-valued constraint constrains only when the flag is on
        (reference distribution.py:117-147)."""
        constraint_on = ChoiceMap.choice(Mask(jnp.asarray(1.5), jnp.asarray(True)))
        tr, w = g.normal.generate(jax.random.key(0), constraint_on, (0.0, 1.0))
        assert jnp.allclose(tr.get_retval(), 1.5)
        assert jnp.allclose(w, g.normal.logpdf(1.5, 0.0, 1.0), atol=1e-6)

        constraint_off = ChoiceMap.choice(Mask(jnp.asarray(1.5), jnp.asarray(False)))
        tr, w = g.normal.generate(jax.random.key(0), constraint_off, (0.0, 1.0))
        assert not jnp.allclose(tr.get_retval(), 1.5)
        assert jnp.allclose(w, 0.0)

    def test_update_with_masked_constraint(self):
        from genjax_tpu import Diff, Update

        tr = g.normal.simulate(jax.random.key(0), (0.0, 1.0))
        masked = ChoiceMap.choice(Mask(jnp.asarray(2.0), jnp.asarray(True)))
        new_tr, w, _, bwd = g.normal.edit(
            jax.random.key(1), tr, Update(masked), Diff.no_change((0.0, 1.0))
        )
        assert jnp.allclose(new_tr.get_retval(), 2.0)
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-6)

        masked_off = ChoiceMap.choice(Mask(jnp.asarray(2.0), jnp.asarray(False)))
        new_tr, w, _, _ = g.normal.edit(
            jax.random.key(1), tr, Update(masked_off), Diff.no_change((0.0, 1.0))
        )
        assert jnp.allclose(new_tr.get_retval(), tr.get_retval())
        assert jnp.allclose(w, 0.0, atol=1e-6)


class TestClosureSugar:
    def test_closure_direct_call_samples(self):
        @g.gen
        def model(mu):
            return g.normal(mu, 1.0) @ "x"

        closure = model(3.0)
        v = closure(jax.random.key(0))
        assert jnp.isfinite(v)

    def test_kwargs_through_at_syntax(self):
        @g.gen
        def inner(x, scale=1.0):
            return g.normal(x, scale) @ "v"

        @g.gen
        def outer():
            return inner(0.0, scale=3.0) @ "sub"

        tr = outer.simulate(jax.random.key(0), ())
        assert ("sub", "v") in tr.get_choices()
        # score uses scale=3
        v = tr.get_choices()["sub", "v"]
        assert jnp.allclose(tr.get_score(), g.normal.logpdf(v, 0.0, 3.0), atol=1e-5)

    def test_distribution_kwargs(self):
        @g.gen
        def model():
            return g.bernoulli(logits=0.3) @ "b"

        tr = model.simulate(jax.random.key(0), ())
        b = tr.get_choices()["b"]
        assert jnp.allclose(
            tr.get_score(), g.bernoulli.logpdf(b, logits=0.3), atol=1e-6
        )


class TestSwitchConstraint:
    def test_choicemap_switch_in_generate(self):
        @g.gen
        def b0():
            return g.normal(0.0, 1.0) @ "x"

        @g.gen
        def b1():
            return g.normal(5.0, 1.0) @ "x"

        sw = g.switch(b0, b1)
        idx = jnp.array(1)
        constraint = ChoiceMap.switch(
            idx, [ChoiceMap.kw(x=0.1), ChoiceMap.kw(x=4.9)]
        )
        tr, w = sw.generate(jax.random.key(0), constraint, (idx, (), ()))
        assert jnp.allclose(tr.get_retval(), 4.9)
        assert jnp.allclose(w, g.normal.logpdf(4.9, 5.0, 1.0), atol=1e-5)


class TestPropose:
    def test_propose(self):
        @g.gen
        def model():
            return g.normal(0.0, 1.0) @ "x"

        chm, score, retval = model.propose(jax.random.key(0), ())
        assert jnp.allclose(chm["x"], retval)
        assert jnp.allclose(score, g.normal.logpdf(retval, 0.0, 1.0), atol=1e-6)


class TestVmapOverTupleAddress:
    def test_nested_model_under_vmap_combinator(self):
        @g.gen
        def inner(mu):
            return g.normal(mu, 1.0) @ "z"

        @g.gen
        def outer(mu):
            a = inner(mu) @ "first"
            b = inner(a) @ "second"
            return b

        mapped = outer.vmap(in_axes=(0,))
        tr = mapped.simulate(jax.random.key(0), (jnp.arange(3.0),))
        chm = tr.get_choices()
        assert chm.get_submap(1)["first", "z"] is not None
        score, _ = mapped.assess(chm, (jnp.arange(3.0),))
        assert jnp.allclose(score, tr.get_score(), atol=1e-5)
