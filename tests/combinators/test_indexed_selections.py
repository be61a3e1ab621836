"""Per-index Selection semantics through `Vmap` and `Scan` (ADVICE r1
items 2/3/5): both combinators consume the integer index level of the
address space — `S[..., "x"]` matches every lane/step, `S[i, "x"]` exactly
one — and statically-unmatchable selections (`S["x"]` at the index level)
raise instead of silently doing nothing.
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as gx
from genjax_tpu.core.choice_map import Selection
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.requests import Regenerate


@gx.gen
def _cell(x):
    z = gx.normal(x, 1.0) @ "z"
    return z


@gx.gen
def _step(c, _x):
    z = gx.normal(c, 1.0) @ "z"
    return (z, z)


_mapped = _cell.vmap(in_axes=(0,))
_scanned = gx.scan(n=5)(_step)


class TestVmapIndexedSelection:
    def test_single_lane_regenerate(self):
        xs = jnp.arange(4.0)
        tr = _mapped.simulate(jax.random.key(0), (xs,))
        new_tr, w, _, _ = _mapped.edit(
            jax.random.key(1),
            tr,
            Regenerate(Selection.at[1, "z"]),
            Diff.no_change((xs,)),
        )
        old_z = tr.get_choices()[..., "z"]
        new_z = new_tr.get_choices()[..., "z"]
        changed = ~jnp.isclose(old_z, new_z)
        # Exactly lane 1 was resampled.
        assert bool(changed[1])
        assert not bool(jnp.any(changed.at[1].set(False)))
        # Weight is the joint delta.
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)

    def test_wildcard_regenerates_every_lane(self):
        xs = jnp.arange(4.0)
        tr = _mapped.simulate(jax.random.key(0), (xs,))
        new_tr, _, _, _ = _mapped.edit(
            jax.random.key(1),
            tr,
            Regenerate(Selection.at[..., "z"]),
            Diff.no_change((xs,)),
        )
        changed = ~jnp.isclose(tr.get_choices()[..., "z"], new_tr.get_choices()[..., "z"])
        assert bool(jnp.all(changed))

    def test_unmatchable_selection_raises(self):
        xs = jnp.arange(4.0)
        tr = _mapped.simulate(jax.random.key(0), (xs,))
        with pytest.raises(ValueError, match="integer-indexed"):
            _mapped.edit(
                jax.random.key(1),
                tr,
                Regenerate(Selection.at["z"]),
                Diff.no_change((xs,)),
            )
        with pytest.raises(ValueError, match="integer-indexed"):
            _mapped.project(jax.random.key(1), tr, Selection.at["z"])

    def test_indexed_project_is_lane_score(self):
        xs = jnp.arange(4.0)
        tr = _mapped.simulate(jax.random.key(0), (xs,))
        w = _mapped.project(jax.random.key(1), tr, Selection.at[2, "z"])
        lane_scores = jax.vmap(lambda t: t.get_score())(tr.inner)
        assert jnp.allclose(w, lane_scores[2], atol=1e-6)
        w_all = _mapped.project(jax.random.key(1), tr, Selection.at[..., "z"])
        assert jnp.allclose(w_all, tr.get_score(), atol=1e-5)


class TestScanIndexedSelection:
    def test_single_step_regenerate(self):
        tr = _scanned.simulate(jax.random.key(0), (0.0, None))
        new_tr, w, _, _ = _scanned.edit(
            jax.random.key(1),
            tr,
            Regenerate(Selection.at[2, "z"]),
            Diff.no_change((0.0, None)),
        )
        old_z = tr.get_choices()[..., "z"]
        new_z = new_tr.get_choices()[..., "z"]
        changed = ~jnp.isclose(old_z, new_z)
        # Step 2 resampled; steps 0 and 1 untouched. (Steps > 2 keep their
        # values too — the carry chain changes their scores, not values.)
        assert bool(changed[2])
        assert not bool(changed[0]) and not bool(changed[1])
        assert not bool(jnp.any(changed[3:]))
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)

    def test_indexed_project_is_step_score(self):
        tr = _scanned.simulate(jax.random.key(0), (0.0, None))
        w = _scanned.project(jax.random.key(1), tr, Selection.at[3, "z"])
        step_scores = jax.vmap(lambda t: t.get_score())(tr.inner)
        assert jnp.allclose(w, step_scores[3], atol=1e-6)

    def test_unmatchable_selection_raises(self):
        tr = _scanned.simulate(jax.random.key(0), (0.0, None))
        with pytest.raises(ValueError, match="integer-indexed"):
            _scanned.edit(
                jax.random.key(1),
                tr,
                Regenerate(Selection.at["z"]),
                Diff.no_change((0.0, None)),
            )

    def test_jit_traced_index_selection(self):
        """The whole per-index path must stage under jit (traced step
        index against an integer-keyed selection → MaskedSel → dense
        select in Distribution.edit_regenerate)."""

        @jax.jit
        def move(key, tr):
            new_tr, w, _, _ = _scanned.edit(
                key,
                tr,
                Regenerate(Selection.at[2, "z"]),
                Diff.no_change((0.0, None)),
            )
            return new_tr.get_score(), w

        tr = _scanned.simulate(jax.random.key(0), (0.0, None))
        score, w = move(jax.random.key(1), tr)
        assert jnp.isfinite(score) and jnp.isfinite(w)
