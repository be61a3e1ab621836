"""Hypothesis property tests: the GFI weight identities must hold
through the combinator algebra — scan over a nested callee, vmap,
switch — not just for flat models (those identities live in
tests/lang/test_gfi_properties.py).

Mirrors the reference's strategy of asserting edit/update weight
telescoping on composite models (SURVEY.md §4), randomized over model
parameters, edit sites, and PRNG seeds.
"""

import jax
import jax.numpy as jnp
from hypothesis import given, settings
from hypothesis import strategies as st

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff, Regenerate, Selection, Update

finite = st.floats(min_value=-2, max_value=2, allow_nan=False)
seeds = st.integers(min_value=0, max_value=2**20)
T = 4


@g.gen
def inner(loc):
    u = g.normal(loc, 0.5) @ "u"
    return u


@g.gen
def step(carry, _):
    x = g.normal(carry, 1.0) @ "x"
    y = inner(x) @ "sub"
    return x + 0.1 * y, x


chain = step.scan(n=T)


@g.gen
def kernel(x):
    z = g.normal(x, 1.0) @ "z"
    return z


@g.gen
def branch_lo():
    return g.normal(0.0, 1.0) @ "lo"


@g.gen
def branch_hi():
    return g.normal(5.0, 2.0) @ "hi"


class TestScanNestedIdentities:
    """Scan whose step calls a nested @gen function — identities must
    survive the carry dependency chain (an edit at step i changes the
    density of every later step)."""

    @settings(max_examples=10, deadline=None)
    @given(finite, seeds)
    def test_simulate_assess_agree(self, c0, seed):
        tr = chain.simulate(jax.random.key(seed), (c0, None))
        score, _ = chain.assess(tr.get_choices(), (c0, None))
        assert jnp.allclose(score, tr.get_score(), atol=1e-4)

    @settings(max_examples=10, deadline=None)
    @given(finite, finite, st.integers(min_value=0, max_value=T - 1), seeds)
    def test_indexed_update_telescopes_and_roundtrips(
        self, c0, new_x, idx, seed
    ):
        tr = chain.simulate(jax.random.key(seed), (c0, None))
        constraint = ChoiceMap.entry(ChoiceMap.kw(x=new_x), jnp.array(idx))
        new_tr, w, _, bwd = chain.edit(
            jax.random.key(seed + 1),
            tr,
            Update(constraint),
            Diff.no_change((c0, None)),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)
        # roundtrip through the backward request restores the joint exactly
        assert isinstance(bwd, Update)
        back, w2, _, _ = chain.edit(
            jax.random.key(seed + 2),
            new_tr,
            bwd,
            Diff.no_change((c0, None)),
        )
        assert jnp.allclose(w + w2, 0.0, atol=1e-4)
        assert jnp.allclose(back.get_score(), tr.get_score(), atol=1e-4)

    @settings(max_examples=8, deadline=None)
    @given(finite, seeds)
    def test_regenerate_nested_site_is_joint_delta(self, c0, seed):
        """Regenerating the nested callee's site at every step: weight is
        the full joint score delta (reference Regenerate semantics)."""
        tr = chain.simulate(jax.random.key(seed), (c0, None))
        new_tr, w, _, _ = chain.edit(
            jax.random.key(seed + 1),
            tr,
            Regenerate(Selection.at[..., "sub", "u"]),
            Diff.no_change((c0, None)),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)


class TestVmapIdentities:
    @settings(max_examples=10, deadline=None)
    @given(finite, seeds)
    def test_simulate_assess_agree(self, shift, seed):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.arange(5.0) + shift
        tr = mapped.simulate(jax.random.key(seed), (xs,))
        score, _ = mapped.assess(tr.get_choices(), (xs,))
        assert jnp.allclose(score, tr.get_score(), atol=1e-4)

    @settings(max_examples=10, deadline=None)
    @given(finite, seeds)
    def test_regenerate_broadcast_is_joint_delta(self, shift, seed):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.arange(4.0) + shift
        tr = mapped.simulate(jax.random.key(seed), (xs,))
        new_tr, w, _, _ = mapped.edit(
            jax.random.key(seed + 1),
            tr,
            Regenerate(Selection.at[..., "z"]),
            Diff.no_change((xs,)),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    @settings(max_examples=10, deadline=None)
    @given(finite, finite, st.integers(min_value=0, max_value=3), seeds)
    def test_indexed_update_telescopes(self, shift, new_z, idx, seed):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.arange(4.0) + shift
        tr = mapped.simulate(jax.random.key(seed), (xs,))
        constraint = ChoiceMap.entry(ChoiceMap.kw(z=new_z), jnp.array(idx))
        new_tr, w, _, _ = mapped.edit(
            jax.random.key(seed + 1),
            tr,
            Update(constraint),
            Diff.no_change((xs,)),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)


class TestSwitchIdentities:
    @settings(max_examples=10, deadline=None)
    @given(st.integers(min_value=0, max_value=1), seeds)
    def test_simulate_assess_agree(self, idx, seed):
        sw = g.switch(branch_lo, branch_hi)
        args = (jnp.array(idx), (), ())
        tr = sw.simulate(jax.random.key(seed), args)
        score, _ = sw.assess(tr.get_choices(), args)
        assert jnp.allclose(score, tr.get_score(), atol=1e-4)

    @settings(max_examples=10, deadline=None)
    @given(st.integers(min_value=0, max_value=1), finite, seeds)
    def test_same_index_update_telescopes(self, idx, new_v, seed):
        sw = g.switch(branch_lo, branch_hi)
        args = (jnp.array(idx), (), ())
        tr = sw.simulate(jax.random.key(seed), args)
        addr = "lo" if idx == 0 else "hi"
        new_tr, w, _, _ = sw.edit(
            jax.random.key(seed + 1),
            tr,
            Update(ChoiceMap.kw(**{addr: new_v})),
            Diff.no_change(args),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    @settings(max_examples=8, deadline=None)
    @given(st.integers(min_value=0, max_value=1), seeds)
    def test_regenerate_branch_site_joint_delta(self, idx, seed):
        """Regenerate with an unchanged index delegates to the active
        branch; weight is the joint delta."""
        sw = g.switch(branch_lo, branch_hi)
        args = (jnp.array(idx), (), ())
        tr = sw.simulate(jax.random.key(seed), args)
        addr = "lo" if idx == 0 else "hi"
        new_tr, w, _, _ = sw.edit(
            jax.random.key(seed + 1),
            tr,
            Regenerate(Selection.at[addr]),
            Diff.no_change(args),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    @settings(max_examples=8, deadline=None)
    @given(st.integers(min_value=0, max_value=1), seeds)
    def test_regenerate_with_index_flip_joint_delta(self, idx, seed):
        """Regenerate under an index-changing argdiff fresh-simulates the
        new branch; weight is still the joint delta."""
        sw = g.switch(branch_lo, branch_hi)
        tr = sw.simulate(jax.random.key(seed), (jnp.array(idx), (), ()))
        new_tr, w, _, _ = sw.edit(
            jax.random.key(seed + 1),
            tr,
            Regenerate(Selection.all()),
            (
                Diff.unknown_change(jnp.array(1 - idx)),
                Diff.no_change(()),
                Diff.no_change(()),
            ),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    @settings(max_examples=10, deadline=None)
    @given(st.integers(min_value=0, max_value=1), seeds)
    def test_index_flip_update_weight(self, idx, seed):
        """Changing the branch index with the new branch fully
        constrained: weight is new joint minus old joint (the constraint
        supplies every new-branch choice, so no proposal terms)."""
        sw = g.switch(branch_lo, branch_hi)
        tr = sw.simulate(jax.random.key(seed), (jnp.array(idx), (), ()))
        new_idx = 1 - idx
        addr = "lo" if new_idx == 0 else "hi"
        new_tr, w, _, _ = sw.edit(
            jax.random.key(seed + 1),
            tr,
            Update(ChoiceMap.kw(**{addr: 1.25})),
            (
                Diff.unknown_change(jnp.array(new_idx)),
                Diff.no_change(()),
                Diff.no_change(()),
            ),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)


class TestComposedIdentities:
    """The composed combinators (or_else = switch+contramap, repeat =
    vmap+dimap) must inherit the same weight identities."""

    @settings(max_examples=8, deadline=None)
    @given(st.booleans(), seeds)
    def test_or_else_regenerate(self, flag, seed):
        oe = g.or_else(branch_lo, branch_hi)
        args = (jnp.array(flag), (), ())
        tr = oe.simulate(jax.random.key(seed), args)
        addr = "lo" if flag else "hi"
        new_tr, w, _, _ = oe.edit(
            jax.random.key(seed + 1),
            tr,
            Regenerate(Selection.at[addr]),
            Diff.no_change(args),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    @settings(max_examples=8, deadline=None)
    @given(finite, seeds)
    def test_repeat_regenerate(self, x, seed):
        rep = g.repeat(n=4)(kernel)
        tr = rep.simulate(jax.random.key(seed), (x,))
        new_tr, w, _, _ = rep.edit(
            jax.random.key(seed + 1),
            tr,
            Regenerate(Selection.at[..., "z"]),
            Diff.no_change((x,)),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)


class TestSwitchRuntimeIndexDiff:
    """With an UnknownChange index tangent, the runtime index may still be
    EQUAL to the stored one — an Update must then keep unconstrained
    values (same-branch edit), resampling only where the index really
    moved (round-4 fix; previously the fresh path ran unconditionally)."""

    def _sw(self):
        @g.gen
        def br0(x):
            return g.normal(x, 1.0) @ "v"

        @g.gen
        def br1(x):
            return g.gamma(2.0, 1.0 + x * x) @ "v"

        return g.switch(br0, br1)

    def test_unknown_but_equal_idx_keeps_values(self):
        sw = self._sw()
        ks = jax.random.split(jax.random.key(0), 2)
        args = (jnp.int32(0), (jnp.float32(0.3),), (jnp.float32(0.3),))
        tr = sw.simulate(ks[0], args)
        ad = (
            Diff.unknown_change(jnp.int32(0)),
            (Diff.no_change(jnp.float32(0.3)),),
            (Diff.no_change(jnp.float32(0.3)),),
        )
        new_tr, w, _, bwd = sw.edit(ks[1], tr, Update(ChoiceMap.empty()), ad)
        assert jnp.allclose(
            new_tr.get_choices()("v").get_value().value,
            tr.get_choices()("v").get_value().value,
        )
        assert jnp.allclose(w, 0.0, atol=1e-6)
        assert jnp.allclose(new_tr.get_score(), tr.get_score(), atol=1e-6)

    def test_unknown_moved_idx_round_trip(self):
        sw = self._sw()
        ks = jax.random.split(jax.random.key(1), 3)
        args = (jnp.int32(0), (jnp.float32(0.3),), (jnp.float32(0.3),))
        tr = sw.simulate(ks[0], args)
        new_args = (jnp.int32(1), (jnp.float32(0.3),), (jnp.float32(0.3),))
        ad = (
            Diff.unknown_change(jnp.int32(1)),
            (Diff.no_change(jnp.float32(0.3)),),
            (Diff.no_change(jnp.float32(0.3)),),
        )
        new_tr, w, _, bwd = sw.edit(ks[1], tr, Update(ChoiceMap.empty()), ad)
        # index move: weight is the full joint delta
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)
        # applying the backward (with the index restored) recovers the
        # original score exactly
        back_ad = (
            Diff.unknown_change(jnp.int32(0)),
            (Diff.no_change(jnp.float32(0.3)),),
            (Diff.no_change(jnp.float32(0.3)),),
        )
        assert isinstance(bwd, Update)
        back, w_back, _, _ = sw.edit(ks[2], new_tr, bwd, back_ad)
        assert jnp.allclose(back.get_score(), tr.get_score(), atol=1e-5)
        assert jnp.allclose(w + w_back, 0.0, atol=1e-5)


class TestSwitchHeterogeneousBackward:
    """A NoChange-index Update over branches with structurally DIFFERENT
    discard shapes (here: a two-site branch vs a one-site branch) must
    still return a representable backward Update — the per-branch
    discards merge under a runtime ChoiceMap.switch node (round-4 fix;
    previously an UnsupportedBackwardRequest sentinel that crashed the
    static language's backward assembly)."""

    def _sw(self):
        @g.gen
        def br0(x):
            v = g.gamma(2.0, 1.0 + x * x) @ "v"
            u = g.normal(v, 0.5) @ "u"
            return u

        @g.gen
        def br1(x):
            return g.normal(x, 1.0) @ "v"

        return g.switch(br0, br1)

    def test_nochange_idx_heterogeneous_round_trip(self):
        sw = self._sw()
        for idx in (0, 1):
            ks = jax.random.split(jax.random.key(idx), 4)
            args = (jnp.int32(idx), (jnp.float32(0.3),), (jnp.float32(0.3),))
            tr = sw.simulate(ks[0], args)
            donor = sw.simulate(ks[3], args)
            new_tr, w, _, bwd = sw.edit(
                ks[1], tr, Update(donor.get_choices()), Diff.no_change(args)
            )
            assert isinstance(bwd, Update)
            assert jnp.allclose(
                w, new_tr.get_score() - tr.get_score(), atol=1e-5
            )
            back, w_back, _, _ = sw.edit(
                ks[2], new_tr, bwd, Diff.no_change(args)
            )
            assert jnp.allclose(back.get_score(), tr.get_score(), atol=1e-5)
            assert jnp.allclose(w + w_back, 0.0, atol=1e-5)

    def test_inside_static_model_update(self):
        # the crash path: backward assembly inside the static language
        sw = self._sw()

        @g.gen
        def model(x):
            b = g.flip(0.5) @ "idx"
            r = sw(jnp.int32(b), (x,), (x,)) @ "sw"
            return r

        tr = model.simulate(jax.random.key(0), (jnp.float32(0.2),))
        donor = model.simulate(jax.random.key(7), (jnp.float32(0.2),))
        constraint = donor.get_choices().filter(Selection.at["sw"])
        new_tr, w, _, bwd = model.edit(
            jax.random.key(1), tr, Update(constraint), Diff.no_change(tr.get_args())
        )
        score_true, _ = model.assess(new_tr.get_choices(), tr.get_args())
        assert jnp.allclose(new_tr.get_score(), score_true, atol=1e-4)
        assert jnp.allclose(w, score_true - tr.get_score(), atol=1e-4)
