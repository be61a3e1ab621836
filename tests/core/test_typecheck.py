"""Whole-API runtime type validation (reference beartype parity).

Reference: `src/genjax/__init__.py:23-33` instruments the whole package
with beartype so malformed inputs raise typed errors naming the
parameter. This build's equivalent (`core/typecheck.py`) installs
annotation-driven wrappers at import, ON BY DEFAULT (matching the
reference's always-on beartype); `do_typecheck(False)` disables them,
and `checked_mode()` forces them back on plus the deeper GFI entry
validation."""

import jax
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection, Target
from genjax_tpu.core import typecheck
from genjax_tpu.core.checked import checked_mode


@g.gen
def model():
    x = g.normal(0.0, 1.0) @ "x"
    _ = g.normal(x, 1.0) @ "y"
    return x


@pytest.fixture(scope="module")
def tr():
    return model.simulate(jax.random.key(0), ())


class TestBoundaryErrors:
    def test_filter_rejects_dict(self, tr):
        with checked_mode():
            with pytest.raises(TypeError, match=r"filter.*selection"):
                tr.get_choices().filter({"x": True})

    def test_filter_rejects_choice_map(self, tr):
        with checked_mode():
            with pytest.raises(TypeError, match=r"filter.*selection"):
                tr.get_choices().filter(ChoiceMap.kw(x=1.0))

    def test_merge_rejects_dict(self, tr):
        with checked_mode():
            with pytest.raises(TypeError, match=r"merge.*other"):
                tr.get_choices().merge({"y": 1})

    def test_simulate_rejects_raw_seed(self):
        with checked_mode():
            with pytest.raises(TypeError, match=r"key.*PRNG"):
                model.simulate(42, ())

    def test_simulate_rejects_list_args(self):
        with checked_mode():
            with pytest.raises(TypeError, match=r"args"):
                model.simulate(jax.random.key(0), [1.0])

    def test_target_rejects_non_tuple_args(self):
        with checked_mode():
            with pytest.raises(TypeError, match=r"args"):
                Target(model, "oops", ChoiceMap.empty())

    def test_error_names_method_and_param(self, tr):
        with checked_mode():
            with pytest.raises(TypeError) as exc:
                tr.get_choices().merge({"y": 1})
        msg = str(exc.value)
        assert "merge" in msg and "`other`" in msg and "dict" in msg


class TestValidCallsUnchanged:
    def test_flag_and_selection_filters_pass(self, tr):
        import jax.numpy as jnp

        with checked_mode():
            chm = tr.get_choices()
            assert chm.filter(True) is not None
            assert chm.filter(jnp.asarray(False)) is not None
            assert chm.filter(Selection.at["x"]) is not None

    def test_inference_runs_under_checked_mode(self):
        with checked_mode():
            target = Target(model, (), ChoiceMap.kw(y=0.5))
            alg = g.inference.smc.ImportanceK(target, k_particles=32)
            w, s = alg.random_weighted(jax.random.key(1), target)
        assert s["x"].shape == ()

    def test_edit_requests_under_checked_mode(self, tr):
        from genjax_tpu import Diff, Regenerate, Update
        from genjax_tpu.inference.requests import HMC

        with checked_mode():
            for req in (
                Update(ChoiceMap.kw(x=0.3)),
                Regenerate(Selection.at["x"]),
                HMC(Selection.at["x"], 0.05),
            ):
                new_tr, *_ = req.edit(jax.random.key(2), tr, Diff.no_change(()))
                assert new_tr.get_score().shape == ()

    def test_default_on_catches_without_optin(self, tr):
        # Reference beartype parity: no opt-in needed — a dict where a
        # ChoiceMap belongs raises the typed boundary error by default.
        with pytest.raises(TypeError, match=r"merge.*other"):
            tr.get_choices().merge({"y": 1})
        with pytest.raises(TypeError, match=r"key.*PRNG"):
            model.simulate(7, ())

    def test_do_typecheck_false_disables(self, tr):
        from genjax_tpu.core.typecheck import do_typecheck, is_typechecked

        assert is_typechecked()
        do_typecheck(False)
        try:
            assert not is_typechecked()
            # Wrappers inert: wrong types fall through to whatever the
            # implementation does — but never the typed boundary error.
            try:
                tr.get_choices().merge({"y": 1})
            except TypeError as e:
                assert "`other`" not in str(e)
            except Exception:
                pass
            # checked_mode still forces the wrappers on while disabled.
            with checked_mode():
                with pytest.raises(TypeError, match=r"merge.*other"):
                    tr.get_choices().merge({"y": 1})
        finally:
            do_typecheck(True)
        assert is_typechecked()


class TestZeroCompiledCost:
    def test_hlo_identical_with_and_without_typecheck(self):
        # The wrappers run at Python call time only; the traced
        # computation — and therefore the compiled HLO — must be
        # bit-identical with validation on and off.
        from genjax_tpu.core.typecheck import do_typecheck

        def run(key):
            return model.simulate(key, ()).get_score()

        key = jax.random.key(0)
        on = jax.jit(run).lower(key).as_text()
        do_typecheck(False)
        try:
            off = jax.jit(run).lower(key).as_text()
        finally:
            do_typecheck(True)
        assert on == off


class TestInstrumentation:
    def test_idempotent(self):
        # A first call may wrap framework subclasses defined since import
        # (e.g. by other test modules); an immediate second call must
        # find nothing left to wrap.
        typecheck.instrument(g)
        assert typecheck.instrument(g) == 0

    def test_subclass_overrides_wrapped(self):
        from genjax_tpu.core.choice_map import Static

        assert getattr(vars(Static)["filter"], "__gx_typechecked__", False)

    def test_base_interface_wrapped(self):
        from genjax_tpu.core.gfi import GenerativeFunction

        assert getattr(
            vars(GenerativeFunction)["simulate"], "__gx_typechecked__", False
        )

    def test_wrappers_preserve_metadata(self):
        from genjax_tpu.core.choice_map import ChoiceMap as CM

        fn = vars(CM)["filter"]
        assert fn.__name__ == "filter"
        assert hasattr(fn, "__wrapped__")  # functools.wraps chain intact
        import inspect

        assert "selection" in inspect.signature(fn).parameters
