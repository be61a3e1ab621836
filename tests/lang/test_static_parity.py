"""Static-language parity pins (reference
tests/generative_functions/test_static_gen_fn.py:40-194, 733-1163): decorator
metadata transfer, sample_shape, Switch choice maps through generate/assess,
literal retvals, nested zero traces, forward references, `@gen` methods,
closure kwargs, the full GFI through `.inline`, and pytree-argument updates.

These are behaviors the reference pins in its largest test file; each test
asserts exact densities (no golden files)."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as gx
from genjax_tpu import ChoiceMap, Const, Diff, Pytree

C = gx.ChoiceMapBuilder
KEY = jax.random.key(0)


def normal_lp(v, mu, sigma):
    return float(
        -0.5 * ((v - mu) / sigma) ** 2
        - jnp.log(sigma)
        - 0.5 * jnp.log(2 * jnp.pi)
    )


class TestDecoratorMetadata:
    def test_docstring_transfer(self):
        def original(x: float, y: float) -> float:
            """Adds two numbers."""
            return x + y

        wrapped = gx.gen(original)
        assert wrapped.__doc__ == original.__doc__
        assert wrapped.__name__ == original.__name__
        assert wrapped.__module__ == original.__module__
        assert wrapped.__qualname__ == original.__qualname__
        assert wrapped.__wrapped__ is original
        assert wrapped.__annotations__ == {"x": float, "y": float, "return": float}


class TestMiscStatic:
    def test_static_sample_shape(self):
        @gx.gen
        def f():
            return gx.normal(0.0, 1.0, sample_shape=Const((2, 2))) @ "normal"

        tr = f.simulate(KEY, ())
        assert tr.get_retval().shape == (2, 2)
        # Score is the sum of the four iid densities.
        sc, _ = f.assess(C["normal"].set(jnp.zeros((2, 2))), ())
        assert jnp.allclose(sc, 4 * normal_lp(0.0, 0.0, 1.0))

    def test_switch_chm_merged_with_static(self):
        @gx.gen
        def model():
            x = gx.normal(0.0, 1.0) @ "x"
            y = gx.normal(0.0, 1.0) @ "y"
            return x, y

        switch_chm = ChoiceMap.switch(
            jnp.int32(1), [C["x"].set(2.3), C["x"].set(3.4)]
        )
        merged = switch_chm.merge(C["y"].set(4.5))
        tr, w = model.importance(KEY, merged, ())
        assert jnp.allclose(tr.get_retval()[0], 3.4)
        assert jnp.allclose(tr.get_retval()[1], 4.5)
        # Both addresses constrained: the weight is the full joint.
        assert jnp.allclose(
            w, normal_lp(3.4, 0.0, 1.0) + normal_lp(4.5, 0.0, 1.0), atol=1e-5
        )

    def test_assess_vmapped_switch_constraint(self):
        # Reference regression GEN-903: a Switch choice map built under jit,
        # fed to both importance and assess of a vmapped distribution.
        gf = gx.flip.vmap(in_axes=(0,))

        def get_choicemap(idx):
            return ChoiceMap.switch(
                idx,
                [
                    C.set(jnp.array([0, 0, 1], dtype=bool)),
                    C.set(jnp.array([1, 1, 1], dtype=bool)),
                ],
            )

        chm = jax.jit(get_choicemap)(1)
        probs = jnp.array([0.2, 0.4, 0.6])
        tr, w = gf.importance(KEY, chm, (probs,))
        score, retval = gf.assess(chm, (probs,))
        assert jnp.array_equal(tr.get_retval(), retval)
        assert jnp.allclose(tr.get_score(), score)
        assert jnp.allclose(score, w), "fully constrained => score == weight"
        assert jnp.allclose(score, float(jnp.sum(jnp.log(probs))))

    def test_literal_retval_survives_update(self):
        @gx.gen
        def f():
            return 1

        tr = f.simulate(KEY, ())
        new_tr, w, _, _ = tr.update(KEY, ChoiceMap.empty(), ())
        assert tr.get_retval() == 1
        assert new_tr.get_retval() == 1
        assert jnp.allclose(w, 0.0)

    def test_zero_trace_nested_structure(self):
        @gx.gen
        def inner_model():
            return gx.normal(0.0, 1.0) @ "inner"

        @gx.gen
        def nested_model():
            outer = gx.normal(0.0, 1.0) @ "outer"
            inner_result = inner_model() @ "nested"
            return outer + inner_result

        zt = nested_model.get_zero_trace()
        assert zt.get_args() == ()
        assert zt.get_retval() == 0.0
        assert zt.get_score() == 0.0
        zc = zt.get_choices()
        assert zc["outer"] == 0.0
        assert zc["nested", "inner"] == 0.0


class TestForwardRefAndMethods:
    def test_forward_reference_callee(self):
        # `helper` is defined after the caller is decorated; resolution
        # happens at trace time, as in ordinary Python closures.
        @gx.gen
        def fwd_model():
            return _fwd_helper() @ "h"

        tr = fwd_model.simulate(KEY, ())
        v = tr.get_choices()["h", "x"]
        assert jnp.allclose(tr.get_score(), normal_lp(v, 0.0, 1.0))

    def test_gen_method_binds_self(self):
        @Pytree.dataclass
        class MyModel(Pytree):
            mu: jnp.ndarray

            @gx.gen
            def run(self, scale):
                return gx.normal(self.mu, scale) @ "x"

        m = MyModel(jnp.asarray(1.0))
        tr = m.run.simulate(KEY, (0.5,))
        sc, _ = m.run.assess(C["x"].set(1.0), (0.5,))
        assert jnp.allclose(sc, normal_lp(1.0, 1.0, 0.5))
        assert tr.get_retval().shape == ()
        # Two instances give independent densities.
        m2 = MyModel(jnp.asarray(-1.0))
        sc2, _ = m2.run.assess(C["x"].set(1.0), (0.5,))
        assert jnp.allclose(sc2, normal_lp(1.0, -1.0, 0.5))

    def test_closure_call_with_kwargs(self):
        @gx.gen
        def kw_callee(x, scale=1.0):
            return gx.normal(x, scale) @ "y"

        @gx.gen
        def kw_caller():
            return kw_callee(0.0, scale=2.0) @ "c"

        sc, _ = kw_caller.assess(C["c", "y"].set(1.0), ())
        assert jnp.allclose(sc, normal_lp(1.0, 0.0, 2.0))


@gx.gen
def _fwd_helper():
    return gx.normal(0.0, 1.0) @ "x"


class TestInlineFullGFI:
    """Reference test_static_gen_fn.py:988-1114 — inline erases the callee's
    address level for every GFI method."""

    @staticmethod
    def _outer():
        @gx.gen
        def inner(x):
            return gx.normal(x, 1.0) @ "z"

        @gx.gen
        def outer():
            return inner.inline(1.0)

        return outer

    def test_inline_simulate_flat_addresses(self):
        outer = self._outer()
        tr = outer.simulate(KEY, ())
        chm = tr.get_choices()
        v = chm["z"]
        assert jnp.allclose(tr.get_score(), normal_lp(v, 1.0, 1.0))

    def test_inline_importance(self):
        outer = self._outer()
        tr, w = outer.importance(KEY, C["z"].set(2.0), ())
        assert jnp.allclose(w, normal_lp(2.0, 1.0, 1.0))
        assert jnp.allclose(tr.get_retval(), 2.0)

    def test_inline_assess(self):
        outer = self._outer()
        sc, rv = outer.assess(C["z"].set(2.0), ())
        assert jnp.allclose(sc, normal_lp(2.0, 1.0, 1.0))
        assert jnp.allclose(rv, 2.0)

    def test_inline_update(self):
        outer = self._outer()
        tr, _ = outer.importance(KEY, C["z"].set(2.0), ())
        new_tr, w, _, bwd = tr.update(KEY, C["z"].set(3.0), ())
        assert jnp.allclose(
            w, normal_lp(3.0, 1.0, 1.0) - normal_lp(2.0, 1.0, 1.0)
        )
        assert jnp.allclose(new_tr.get_choices()["z"], 3.0)


class TestPytreeArguments:
    def test_update_with_pytree_argument(self):
        @Pytree.dataclass
        class Params(Pytree):
            loc: jnp.ndarray

        @gx.gen
        def pmodel(p):
            return gx.normal(p.loc, 1.0) @ "x"

        tr, _ = pmodel.importance(
            KEY, C["x"].set(0.25), (Params(jnp.asarray(0.0)),)
        )
        new_tr, w, _, _ = tr.update(
            KEY,
            C["x"].set(1.0),
            (Diff.unknown_change(Params(jnp.asarray(0.5))),),
        )
        expected = normal_lp(1.0, 0.5, 1.0) - normal_lp(0.25, 0.0, 1.0)
        assert jnp.allclose(w, expected, atol=1e-6)
        assert jnp.allclose(new_tr.get_args()[0].loc, 0.5)

    def test_simulate_with_dict_argument(self):
        @gx.gen
        def dmodel(cfg):
            return gx.normal(cfg["loc"], cfg["scale"]) @ "x"

        sc, _ = dmodel.assess(
            C["x"].set(2.0), ({"loc": 1.0, "scale": 2.0},)
        )
        assert jnp.allclose(sc, normal_lp(2.0, 1.0, 2.0))
