"""Hypothesis property tests of GFI weight identities over randomized
model parameters and edits."""

import jax
import jax.numpy as jnp
from hypothesis import given, settings
from hypothesis import strategies as st

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Regenerate, Selection

finite = st.floats(min_value=-3, max_value=3, allow_nan=False)
positive = st.floats(min_value=0.2, max_value=3, allow_nan=False)
seeds = st.integers(min_value=0, max_value=2**20)


@g.gen
def model(mu, sigma):
    a = g.normal(mu, sigma) @ "a"
    b = g.normal(a, 1.0) @ "b"
    c = g.gamma(2.0, 1.0) @ "c"
    return b * c


class TestWeightIdentities:
    @settings(max_examples=15, deadline=None)
    @given(finite, positive, seeds)
    def test_simulate_assess_agree(self, mu, sigma, seed):
        tr = model.simulate(jax.random.key(seed), (mu, sigma))
        score, retval = model.assess(tr.get_choices(), (mu, sigma))
        assert jnp.allclose(score, tr.get_score(), atol=1e-4)
        assert jnp.allclose(retval, tr.get_retval(), atol=1e-4)

    @settings(max_examples=15, deadline=None)
    @given(finite, positive, finite, seeds)
    def test_update_telescopes(self, mu, sigma, new_a, seed):
        """w(update) == new_score - old_score whenever the constraint only
        replaces values (no proposals involved)."""
        tr = model.simulate(jax.random.key(seed), (mu, sigma))
        new_tr, w, _, discard = tr.update(
            jax.random.key(seed + 1), ChoiceMap.kw(a=new_a)
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)
        # roundtrip through the discard restores everything exactly
        back, w2, _, _ = new_tr.update(jax.random.key(seed + 2), discard)
        assert jnp.allclose(w + w2, 0.0, atol=1e-4)
        assert jnp.allclose(back.get_score(), tr.get_score(), atol=1e-4)

    @settings(max_examples=15, deadline=None)
    @given(finite, positive, finite, finite, seeds)
    def test_argdiff_update_telescopes(self, mu, sigma, new_mu, new_a, seed):
        tr = model.simulate(jax.random.key(seed), (mu, sigma))
        new_tr, w, _, _ = tr.update(
            jax.random.key(seed + 1),
            ChoiceMap.kw(a=new_a),
            g.Diff.unknown_change((new_mu, sigma)),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    @settings(max_examples=15, deadline=None)
    @given(finite, positive, seeds)
    def test_regenerate_weight_is_joint_delta(self, mu, sigma, seed):
        """Reference semantics: regenerate weight telescopes to the full
        joint score delta (reference tests assert the same identity)."""
        tr = model.simulate(jax.random.key(seed), (mu, sigma))
        req = Regenerate(Selection.at["a"])
        new_tr, w, _, _ = req.edit(
            jax.random.key(seed + 1), tr, g.Diff.no_change((mu, sigma))
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    @settings(max_examples=15, deadline=None)
    @given(finite, positive, seeds)
    def test_importance_weight_identity(self, mu, sigma, seed):
        """generate weight == joint score minus the internally-proposed
        addresses' scores."""
        obs_b = 0.7
        tr, w = model.importance(
            jax.random.key(seed), ChoiceMap.kw(b=obs_b), (mu, sigma)
        )
        internal = tr.project(jax.random.key(0), Selection.at["a"] | Selection.at["c"])
        assert jnp.allclose(w, tr.get_score() - internal, atol=1e-4)

    @settings(max_examples=15, deadline=None)
    @given(finite, positive, seeds)
    def test_project_partitions_score(self, mu, sigma, seed):
        tr = model.simulate(jax.random.key(seed), (mu, sigma))
        key = jax.random.key(0)
        total = sum(
            tr.project(key, Selection.at[addr]) for addr in ["a", "b", "c"]
        )
        assert jnp.allclose(total, tr.get_score(), atol=1e-4)


class TestKwargsGFI:
    def test_kwargs_model_full_gfi(self):
        @g.gen
        def kw_model(x, scale=1.0):
            v = g.normal(x, scale) @ "v"
            return v

        km = kw_model.handle_kwargs()
        args = ((0.5,), {"scale": 2.0})
        tr = km.simulate(jax.random.key(0), args)
        v = tr.get_choices()["v"]
        assert jnp.allclose(tr.get_score(), g.normal.logpdf(v, 0.5, 2.0), atol=1e-5)
        score, _ = km.assess(tr.get_choices(), args)
        assert jnp.allclose(score, tr.get_score(), atol=1e-5)
        tr2, w = km.generate(jax.random.key(1), ChoiceMap.kw(v=1.0), args)
        assert jnp.allclose(w, g.normal.logpdf(1.0, 0.5, 2.0), atol=1e-5)
        # edit through kwargs argdiffs
        new_tr, w, _, _ = km.edit(
            jax.random.key(2),
            tr,
            g.Update(ChoiceMap.kw(v=0.0)),
            g.Diff.no_change(args),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)
