"""GFI contract tests for the @gen static language, asserting exact
log-density identities (parity: reference
tests/generative_functions/test_static_gen_fn.py idioms)."""

import math

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff, Regenerate, Selection, Update
from genjax_tpu.lang.static import AddressReuse, MissingAddress


def normal_logpdf(v, mu, sigma):
    return -0.5 * ((v - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * math.log(2 * math.pi)


@g.gen
def simple_normal(mu):
    x = g.normal(mu, 1.0) @ "x"
    y = g.normal(x, 2.0) @ "y"
    return x + y


class TestSimulate:
    def test_score_is_exact_joint_density(self):
        key = jax.random.key(314)
        tr = jax.jit(simple_normal.simulate)(key, (0.0,))
        chm = tr.get_choices()
        expected = normal_logpdf(chm["x"], 0.0, 1.0) + normal_logpdf(
            chm["y"], chm["x"], 2.0
        )
        assert jnp.allclose(tr.get_score(), expected, atol=1e-5)

    def test_retval(self):
        tr = simple_normal.simulate(jax.random.key(0), (0.0,))
        chm = tr.get_choices()
        assert jnp.allclose(tr.get_retval(), chm["x"] + chm["y"])

    def test_get_args(self):
        tr = simple_normal.simulate(jax.random.key(0), (1.5,))
        assert tr.get_args() == (1.5,)

    def test_subtrace(self):
        tr = simple_normal.simulate(jax.random.key(0), (0.0,))
        sub = tr.get_subtrace("x")
        assert jnp.allclose(sub.get_retval(), tr.get_choices()["x"])

    def test_vmapped_keys_differ(self):
        keys = jax.random.split(jax.random.key(0), 16)
        trs = jax.vmap(simple_normal.simulate, in_axes=(0, None))(keys, (0.0,))
        xs = trs.get_choices()["x"]
        assert jnp.std(xs) > 0.1

    def test_address_reuse_raises(self):
        @g.gen
        def bad():
            _ = g.normal(0.0, 1.0) @ "x"
            _ = g.normal(0.0, 1.0) @ "x"

        with pytest.raises(AddressReuse):
            bad.simulate(jax.random.key(0), ())

    def test_tracer_address_raises(self):
        @g.gen
        def bad(i):
            _ = g.normal(0.0, 1.0) @ i

        with pytest.raises(TypeError):
            bad.simulate(jax.random.key(0), (jnp.array(1),))


class TestAssess:
    def test_assess_matches_simulate_score(self):
        tr = simple_normal.simulate(jax.random.key(1), (0.5,))
        score, retval = simple_normal.assess(tr.get_choices(), (0.5,))
        assert jnp.allclose(score, tr.get_score(), atol=1e-6)
        assert jnp.allclose(retval, tr.get_retval())

    def test_missing_address_raises(self):
        with pytest.raises(MissingAddress):
            simple_normal.assess(ChoiceMap.kw(x=1.0), (0.0,))


class TestGenerate:
    def test_full_constraint_weight_is_joint(self):
        chm = ChoiceMap.kw(x=1.0, y=2.0)
        tr, w = simple_normal.generate(jax.random.key(0), chm, (0.0,))
        expected = normal_logpdf(1.0, 0.0, 1.0) + normal_logpdf(2.0, 1.0, 2.0)
        assert jnp.allclose(w, expected, atol=1e-6)
        assert jnp.allclose(tr.get_score(), expected, atol=1e-6)

    def test_partial_constraint_weight(self):
        chm = ChoiceMap.kw(y=2.0)
        tr, w = simple_normal.generate(jax.random.key(0), chm, (0.0,))
        x = tr.get_choices()["x"]
        # weight = logpdf of constrained address under its local proposal
        assert jnp.allclose(w, normal_logpdf(2.0, x, 2.0), atol=1e-6)

    def test_empty_constraint_zero_weight(self):
        tr, w = simple_normal.generate(jax.random.key(0), ChoiceMap.empty(), (0.0,))
        assert jnp.allclose(w, 0.0)

    def test_importance_alias(self):
        chm = ChoiceMap.kw(y=2.0)
        tr1, w1 = simple_normal.importance(jax.random.key(3), chm, (0.0,))
        tr2, w2 = simple_normal.generate(jax.random.key(3), chm, (0.0,))
        assert jnp.allclose(w1, w2)


class TestUpdate:
    def test_update_weight_identity(self):
        """update weight == new_score - old_score + bwd discard score terms.

        For constraining `x` to a new value with unchanged args, the
        discard is old x, and w = P(new)/P(old)."""
        key = jax.random.key(7)
        tr = simple_normal.simulate(key, (0.0,))
        old_score = tr.get_score()
        new_tr, w, _rd, discard = tr.update(jax.random.key(8), ChoiceMap.kw(x=3.0))
        assert jnp.allclose(w, new_tr.get_score() - old_score, atol=1e-5)
        assert jnp.allclose(discard["x"], tr.get_choices()["x"])

    def test_update_empty_is_identity(self):
        tr = simple_normal.simulate(jax.random.key(7), (0.0,))
        new_tr, w, rd, _ = tr.update(jax.random.key(8), ChoiceMap.empty())
        assert jnp.allclose(w, 0.0, atol=1e-6)
        assert jnp.allclose(new_tr.get_score(), tr.get_score())
        assert Diff.static_check_no_change(rd)

    def test_update_argdiffs(self):
        tr = simple_normal.simulate(jax.random.key(7), (0.0,))
        new_tr, w, _, _ = tr.update(
            jax.random.key(8), ChoiceMap.empty(), Diff.unknown_change((1.0,))
        )
        # Values retained; only the density of x changes (y depends on x only).
        x = tr.get_choices()["x"]
        expected = normal_logpdf(x, 1.0, 1.0) - normal_logpdf(x, 0.0, 1.0)
        assert jnp.allclose(w, expected, atol=1e-5)

    def test_update_roundtrip_via_discard(self):
        tr = simple_normal.simulate(jax.random.key(7), (0.0,))
        new_tr, w1, _, discard = tr.update(jax.random.key(8), ChoiceMap.kw(x=3.0))
        back_tr, w2, _, _ = new_tr.update(jax.random.key(9), discard)
        assert jnp.allclose(back_tr.get_score(), tr.get_score(), atol=1e-5)
        assert jnp.allclose(w1 + w2, 0.0, atol=1e-5)


class TestRegenerate:
    def test_regenerate_weight(self):
        tr = simple_normal.simulate(jax.random.key(7), (0.0,))
        req = Regenerate(Selection.at["x"])
        new_tr, w, _, _ = req.edit(
            jax.random.key(11), tr, Diff.no_change(tr.get_args())
        )
        # For prior-proposal regeneration the weight telescopes to the
        # score difference at downstream dependent addresses:
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score() , atol=1e-5)
        # y retained
        assert jnp.allclose(
            new_tr.get_choices()["y"], tr.get_choices()["y"]
        )

    def test_regenerate_none_is_identity(self):
        tr = simple_normal.simulate(jax.random.key(7), (0.0,))
        req = Regenerate(Selection.none())
        new_tr, w, rd, _ = req.edit(
            jax.random.key(11), tr, Diff.no_change(tr.get_args())
        )
        assert jnp.allclose(w, 0.0)
        assert Diff.static_check_no_change(rd)


class TestProject:
    def test_project_decomposes_score(self):
        key = jax.random.key(0)
        tr = simple_normal.simulate(key, (0.0,))
        px = tr.project(key, Selection.at["x"])
        py = tr.project(key, Selection.at["y"])
        assert jnp.allclose(px + py, tr.get_score(), atol=1e-6)
        assert jnp.allclose(tr.project(key, Selection.all()), tr.get_score())
        assert jnp.allclose(tr.project(key, Selection.none()), 0.0)


class TestSugar:
    def test_hierarchical_inline(self):
        @g.gen
        def inner(mu):
            return g.normal(mu, 1.0) @ "z"

        @g.gen
        def outer():
            a = inner(0.0) @ "a"
            b = inner.inline(a)
            return b

        tr = outer.simulate(jax.random.key(0), ())
        chm = tr.get_choices()
        assert ("a", "z") in chm
        assert "z" in chm  # inlined address at top level

    def test_partial_apply(self):
        fixed = simple_normal.partial_apply(2.0)
        tr = fixed.simulate(jax.random.key(0), ())
        assert tr.get_args() == ()

    def test_kwargs(self):
        @g.gen
        def model(x, y, z=1.0):
            _ = g.normal(x + y, z) @ "v"
            return x + y + z

        kw_model = model.handle_kwargs()
        tr = kw_model.simulate(jax.random.key(0), ((1.0, 2.0), {"z": 3.0}))
        assert jnp.allclose(tr.get_retval(), 6.0)

    def test_zero_trace(self):
        zt = simple_normal.get_zero_trace(0.0)
        assert jnp.allclose(zt.get_score(), 0.0)
        assert "x" in zt.get_choices()

    def test_invalid_subset(self):
        chm = ChoiceMap.kw(x=1.0, zzz=2.0)
        extras = chm.invalid_subset(simple_normal, (0.0,))
        assert extras is not None and "zzz" in extras
        ok = ChoiceMap.kw(x=1.0)
        assert ok.invalid_subset(simple_normal, (0.0,)) is None
