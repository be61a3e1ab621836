"""Combinator GFI-contract tests with exact log-density assertions
(parity: reference tests/generative_functions/test_{scan,vmap,switch,...}
idioms)."""

import math

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff, IndexRequest, Mask, Selection, Update


def normal_logpdf(v, mu, sigma):
    return -0.5 * ((v - mu) / sigma) ** 2 - jnp.log(sigma) - 0.5 * math.log(2 * math.pi)


@g.gen
def kernel(x):
    z = g.normal(x, 1.0) @ "z"
    return z


class TestVmap:
    def test_score_is_sum(self):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.arange(5.0)
        tr = jax.jit(mapped.simulate)(jax.random.key(0), (xs,))
        zs = jnp.array([tr.get_choices().get_submap(i)["z"] for i in range(5)])
        assert jnp.allclose(tr.get_score(), jnp.sum(normal_logpdf(zs, xs, 1.0)), atol=1e-5)

    def test_assess_roundtrip(self):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.arange(4.0)
        tr = mapped.simulate(jax.random.key(0), (xs,))
        score, _ = mapped.assess(tr.get_choices(), (xs,))
        assert jnp.allclose(score, tr.get_score(), atol=1e-5)

    def test_generate_indexed_constraint(self):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.zeros(5)
        constraint = ChoiceMap.entry(
            ChoiceMap.kw(z=2.0), jnp.array(3)
        )
        tr, w = mapped.generate(jax.random.key(0), constraint, (xs,))
        assert jnp.allclose(tr.get_choices().get_submap(3)["z"], 2.0)
        assert jnp.allclose(w, normal_logpdf(2.0, 0.0, 1.0), atol=1e-5)

    def test_broadcast_validation(self):
        mapped = kernel.vmap(in_axes=(0,))
        with pytest.raises(ValueError):
            # mismatched batch dims under the hood -> jax.vmap errors
            g.Vmap(kernel, (0, 0)).simulate(jax.random.key(0), (jnp.zeros(3),))

    def test_update(self):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.zeros(4)
        tr = mapped.simulate(jax.random.key(0), (xs,))
        constraint = ChoiceMap.entry(ChoiceMap.kw(z=1.5), jnp.array(2))
        new_tr, w, _, _ = mapped.edit(
            jax.random.key(1), tr, Update(constraint), Diff.no_change((xs,))
        )
        assert jnp.allclose(new_tr.get_choices().get_submap(2)["z"], 1.5)
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)

    def test_index_request(self):
        mapped = kernel.vmap(in_axes=(0,))
        xs = jnp.zeros(4)
        tr = mapped.simulate(jax.random.key(0), (xs,))
        req = IndexRequest(jnp.array(1), Update(ChoiceMap.kw(z=0.5)))
        new_tr, w, _, bwd = req.edit(jax.random.key(1), tr, Diff.no_change((xs,)))
        assert jnp.allclose(new_tr.get_choices().get_submap(1)["z"], 0.5)
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)


@g.gen
def walk_step(prev, _):
    x = g.normal(prev, 1.0) @ "x"
    return x, x


class TestScan:
    def test_score_is_sum_of_steps(self):
        model = walk_step.scan(n=20)
        tr = jax.jit(model.simulate)(jax.random.key(0), (0.5, None))
        xs = jnp.stack([tr.get_choices().get_submap(i)["x"] for i in range(20)])
        prevs = jnp.concatenate([jnp.array([0.5]), xs[:-1]])
        expected = jnp.sum(normal_logpdf(xs, prevs, 1.0))
        assert jnp.allclose(tr.get_score(), expected, atol=1e-4)

    def test_retval(self):
        model = walk_step.scan(n=10)
        tr = model.simulate(jax.random.key(0), (0.0, None))
        carry, ys = tr.get_retval()
        assert ys.shape == (10,)
        assert jnp.allclose(carry, ys[-1])

    def test_assess_roundtrip(self):
        model = walk_step.scan(n=10)
        tr = model.simulate(jax.random.key(0), (0.0, None))
        score, retval = model.assess(tr.get_choices(), (0.0, None))
        assert jnp.allclose(score, tr.get_score(), atol=1e-5)

    def test_generate_partial(self):
        model = walk_step.scan(n=5)
        constraint = ChoiceMap.entry(ChoiceMap.kw(x=1.0), jnp.array(2))
        tr, w = model.generate(jax.random.key(0), constraint, (0.0, None))
        assert jnp.allclose(tr.get_choices().get_submap(2)["x"], 1.0)
        x1 = tr.get_choices().get_submap(1)["x"]
        assert jnp.allclose(w, normal_logpdf(1.0, x1, 1.0), atol=1e-5)

    def test_update_rescan(self):
        model = walk_step.scan(n=5)
        tr = model.simulate(jax.random.key(0), (0.0, None))
        constraint = ChoiceMap.entry(ChoiceMap.kw(x=0.0), jnp.array(0))
        new_tr, w, _, bwd = model.edit(
            jax.random.key(1), tr, Update(constraint), Diff.no_change((0.0, None))
        )
        assert jnp.allclose(new_tr.get_choices().get_submap(0)["x"], 0.0)
        # downstream retained values, but density changes through the chain
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    def test_project(self):
        model = walk_step.scan(n=5)
        tr = model.simulate(jax.random.key(0), (0.0, None))
        w = tr.project(jax.random.key(1), Selection.all())
        assert jnp.allclose(w, tr.get_score(), atol=1e-5)
        assert jnp.allclose(tr.project(jax.random.key(1), Selection.none()), 0.0)


class TestScanDerived:
    def test_accumulate(self):
        @g.gen
        def add_noise(acc, x):
            return acc + (g.normal(0.0, 1e-6) @ "eps") + x

        model = g.accumulate()(add_noise)
        tr = model.simulate(jax.random.key(0), (0.0, jnp.ones(4)))
        out = tr.get_retval()
        assert out.shape == (5,)
        assert jnp.allclose(out, jnp.array([0.0, 1.0, 2.0, 3.0, 4.0]), atol=1e-3)

    def test_reduce(self):
        @g.gen
        def add(acc, x):
            return acc + x + 0.0 * (g.normal(0.0, 1.0) @ "n")

        model = g.reduce()(add)
        tr = model.simulate(jax.random.key(0), (0.0, jnp.arange(5.0)))
        assert jnp.allclose(tr.get_retval(), 10.0)

    def test_iterate(self):
        @g.gen
        def double(x):
            return 2 * x + 0.0 * (g.normal(0.0, 1.0) @ "n")

        model = g.iterate(n=3)(double)
        tr = model.simulate(jax.random.key(0), (1.0,))
        assert jnp.allclose(tr.get_retval(), jnp.array([1.0, 2.0, 4.0, 8.0]))

    def test_iterate_final(self):
        @g.gen
        def double(x):
            return 2 * x + 0.0 * (g.normal(0.0, 1.0) @ "n")

        model = g.iterate_final(n=3)(double)
        tr = model.simulate(jax.random.key(0), (1.0,))
        assert jnp.allclose(tr.get_retval(), 8.0)

    def test_masked_iterate_final_score(self):
        model = g.masked_iterate_final()(kernel)
        flags = jnp.arange(6) < 3
        tr = model.simulate(jax.random.key(0), (0.0, flags))
        # score = sum over ACTIVE steps only
        zs = jnp.stack([tr.get_choices()(i)("z").get_value().value for i in range(6)])
        prevs = jnp.concatenate([jnp.array([0.0]), zs[:-1]])
        active = normal_logpdf(zs, prevs, 1.0) * flags
        assert jnp.allclose(tr.get_score(), jnp.sum(active), atol=1e-4)


@g.gen
def branch_a():
    return g.normal(0.0, 1.0) @ "xa"


@g.gen
def branch_b():
    return g.normal(10.0, 1.0) @ "xb"


class TestSwitch:
    def test_simulate_selects_branch(self):
        sw = g.switch(branch_a, branch_b)
        tr = sw.simulate(jax.random.key(0), (jnp.array(1), (), ()))
        assert tr.get_retval() > 5.0
        chm = tr.get_choices()
        v = chm("xb").get_value()
        assert isinstance(v, Mask) and bool(v.primal_flag())
        va = chm("xa").get_value()
        assert not bool(va.primal_flag())

    def test_score_matches_selected_branch(self):
        sw = g.switch(branch_a, branch_b)
        tr = sw.simulate(jax.random.key(0), (jnp.array(0), (), ()))
        xa = tr.get_choices()("xa").get_value().value
        assert jnp.allclose(tr.get_score(), normal_logpdf(xa, 0.0, 1.0), atol=1e-5)

    def test_generate_constrained(self):
        sw = g.switch(branch_a, branch_b)
        tr, w = sw.generate(
            jax.random.key(0), ChoiceMap.kw(xb=9.0), (jnp.array(1), (), ())
        )
        assert jnp.allclose(w, normal_logpdf(9.0, 10.0, 1.0), atol=1e-5)

    def test_assess(self):
        sw = g.switch(branch_a, branch_b)
        tr = sw.simulate(jax.random.key(0), (jnp.array(0), (), ()))
        score, _ = sw.assess(tr.get_choices(), (jnp.array(0), (), ()))
        assert jnp.allclose(score, tr.get_score(), atol=1e-5)

    def test_update_same_index(self):
        sw = g.switch(branch_a, branch_b)
        tr = sw.simulate(jax.random.key(0), (jnp.array(0), (), ()))
        new_tr, w, _, _ = sw.edit(
            jax.random.key(1),
            tr,
            Update(ChoiceMap.kw(xa=0.5)),
            (Diff(jnp.array(0), g.NoChange), Diff((), g.NoChange), Diff((), g.NoChange)),
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)

    def test_update_index_change(self):
        sw = g.switch(branch_a, branch_b)
        tr = sw.simulate(jax.random.key(0), (jnp.array(0), (), ()))
        new_tr, w, _, _ = sw.edit(
            jax.random.key(1),
            tr,
            Update(ChoiceMap.empty()),
            (
                Diff(jnp.array(1), g.UnknownChange),
                Diff((), g.NoChange),
                Diff((), g.NoChange),
            ),
        )
        # weight = new branch score - old branch score (fresh simulate path)
        assert jnp.allclose(
            w, new_tr.get_score() - tr.get_score(), atol=1e-5
        )


class TestMaskCombinator:
    def test_masked_false_zero_score(self):
        masked = kernel.mask()
        tr = masked.simulate(jax.random.key(0), (False, 0.0))
        assert jnp.allclose(tr.get_score(), 0.0)
        assert not tr.get_retval().primal_flag()

    def test_masked_true_full_score(self):
        masked = kernel.mask()
        tr = masked.simulate(jax.random.key(0), (True, 0.0))
        inner_z = tr.inner.get_choices()["z"]
        assert jnp.allclose(tr.get_score(), normal_logpdf(inner_z, 0.0, 1.0), atol=1e-5)

    @pytest.mark.parametrize(
        "pre,post", [(True, True), (True, False), (False, True), (False, False)]
    )
    def test_edit_transition_lattice(self, pre, post):
        masked = kernel.mask()
        tr = masked.simulate(jax.random.key(0), (jnp.array(pre), 0.0))
        new_tr, w, _, _ = masked.edit(
            jax.random.key(1),
            tr,
            Update(ChoiceMap.empty()),
            (Diff(jnp.array(post), g.UnknownChange), Diff(0.0, g.NoChange)),
        )
        # weight must equal score difference in all four cases (no discard)
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)


class TestDimap:
    def test_simulate(self):
        d = kernel.dimap(
            pre=lambda x: (x * 2,), post=lambda args, xformed, r: r + 100.0
        )
        tr = d.simulate(jax.random.key(0), (1.0,))
        assert tr.get_retval() > 90.0
        assert jnp.allclose(
            tr.get_score(), normal_logpdf(tr.inner.get_retval(), 2.0, 1.0), atol=1e-5
        )

    def test_map_contramap(self):
        m = kernel.map(lambda r: r * 0.0)
        tr = m.simulate(jax.random.key(0), (1.0,))
        assert jnp.allclose(tr.get_retval(), 0.0)
        c = kernel.contramap(lambda a, b: (a + b,))
        tr = c.simulate(jax.random.key(0), (1.0, 2.0))
        assert jnp.allclose(
            tr.get_score(), normal_logpdf(tr.get_retval(), 3.0, 1.0), atol=1e-5
        )


class TestComposed:
    def test_repeat(self):
        rep = kernel.repeat(n=8)
        tr = rep.simulate(jax.random.key(0), (0.0,))
        assert tr.get_retval().shape == (8,)
        zs = tr.get_retval()
        assert jnp.allclose(
            tr.get_score(), jnp.sum(normal_logpdf(zs, 0.0, 1.0)), atol=1e-4
        )

    def test_or_else(self):
        oe = g.or_else(branch_a, branch_b)
        tr = oe.simulate(jax.random.key(0), (True, (), ()))
        assert tr.get_retval() < 5.0
        tr = oe.simulate(jax.random.key(0), (False, (), ()))
        assert tr.get_retval() > 5.0

    def test_mix(self):
        mixture = g.mix(branch_a, branch_b)
        logits = jnp.array([jnp.log(0.5), jnp.log(0.5)])
        keys = jax.random.split(jax.random.key(0), 200)
        trs = jax.vmap(lambda k: mixture.simulate(k, (logits, (), ())))(keys)
        rets = trs.get_retval()
        # bimodal: some near 0, some near 10
        assert jnp.sum(rets < 5.0) > 50
        assert jnp.sum(rets > 5.0) > 50
