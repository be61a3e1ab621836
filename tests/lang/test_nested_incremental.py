"""Incremental edits recurse through nested @gen callees, and vectorized
choice-map construction patterns."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff
from genjax_tpu import ChoiceMapBuilder as C


@g.gen
def block(mu):
    p = g.normal(mu, 1.0) @ "p"
    q = g.normal(p, 1.0) @ "q"
    r = g.normal(0.0, 1.0) @ "r"
    return q


@g.gen
def outer():
    a = block(0.0) @ "left"
    b = block(1.0) @ "right"
    return a + b


class TestNestedIncremental:
    def test_inner_reuse_recurses(self):
        """Constraining ("left","r") must reuse: the whole "right" subtree
        AND the unaffected p,q inside "left"."""
        tr = outer.simulate(jax.random.key(0), ())
        new_tr, w, _, _ = tr.update(
            jax.random.key(1), ChoiceMap.entry(2.0, "left", "r")
        )
        # right subtree reused wholesale
        assert new_tr.get_subtrace("right") is tr.get_subtrace("right")
        # within left, p and q reused (r independent of them)
        left_new = new_tr.get_subtrace("left")
        left_old = tr.get_subtrace("left")
        assert left_new.get_subtrace("p") is left_old.get_subtrace("p")
        assert left_new.get_subtrace("q") is left_old.get_subtrace("q")
        # weight is exactly the r-replacement ratio
        expected = g.normal.logpdf(2.0, 0.0, 1.0) - left_old.get_subtrace("r").get_score()
        assert jnp.allclose(w, expected, atol=1e-5)

    def test_compiled_size_scales_with_affected(self):
        tr = outer.simulate(jax.random.key(0), ())
        small = (
            jax.jit(lambda k, t: t.update(k, ChoiceMap.entry(2.0, "left", "r"))[1])
            .lower(jax.random.key(1), tr)
            .compile()
            .as_text()
        )
        big = (
            jax.jit(lambda t: outer.assess(t.get_choices(), ())[0])
            .lower(tr)
            .compile()
            .as_text()
        )
        assert len(small.splitlines()) < len(big.splitlines())


class TestVectorizedChoiceMapConstruction:
    def test_vmapped_builder(self):
        """The reference docstring pattern: build Indexed maps under vmap
        (`choice_map.py` class docstring)."""
        vec_chm = jax.vmap(lambda idx, v: C["x", idx].set(v))(
            jnp.arange(10), jnp.ones(10) * 3.0
        )
        v = vec_chm["x", 4]
        # batched Indexed node: per-index access returns masked values
        assert bool(v.primal_flag())
        assert jnp.allclose(v.value, 3.0)
        missing = vec_chm("x").get_submap(42).get_value()
        assert not bool(missing.primal_flag())

    def test_indexed_constraint_in_vmap_generate(self):
        @g.gen
        def kernel(mu):
            return g.normal(mu, 1.0) @ "z"

        mapped = kernel.vmap(in_axes=(0,))
        idxs = jnp.array([1, 3])
        vals = jnp.array([5.0, 7.0])
        constraint = jax.vmap(lambda i, v: C[i, "z"].set(v))(idxs, vals)
        # the vmapped constraint is an Indexed node over batched submaps
        tr, w = mapped.generate(jax.random.key(0), constraint, (jnp.zeros(6),))
        chm = tr.get_choices()
        assert jnp.allclose(chm.get_submap(1)["z"], 5.0)
        assert jnp.allclose(chm.get_submap(3)["z"], 7.0)
        expected_w = g.normal.logpdf(5.0, 0.0, 1.0) + g.normal.logpdf(7.0, 0.0, 1.0)
        assert jnp.allclose(w, expected_w, atol=1e-5)
