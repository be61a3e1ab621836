"""Per-address edit requests: StaticRequest dict-of-subrequests and
VectorRequest over scan."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff, EmptyRequest, Regenerate, Selection, Update
from genjax_tpu.combinators import VectorRequest
from genjax_tpu.lang.static import StaticRequest


@g.gen
def model():
    a = g.normal(0.0, 1.0) @ "a"
    b = g.normal(a, 1.0) @ "b"
    c = g.normal(0.0, 1.0) @ "c"
    return a + b + c


class TestStaticRequest:
    def test_mixed_per_address_requests(self):
        tr = model.simulate(jax.random.key(0), ())
        request = StaticRequest({
            "a": Update(ChoiceMap.choice(1.0)),
            "c": Regenerate(Selection.all()),
            # "b" defaults to EmptyRequest
        })
        new_tr, w, _, bwd = request.edit(
            jax.random.key(1), tr, Diff.no_change(())
        )
        assert jnp.allclose(new_tr.get_choices()["a"], 1.0)
        # b retained but args changed (a changed): EmptyRequest degrades to
        # Update(empty) with changed argdiffs -> b re-scored
        assert jnp.allclose(new_tr.get_choices()["b"], tr.get_choices()["b"])
        assert not jnp.allclose(new_tr.get_choices()["c"], tr.get_choices()["c"])
        assert isinstance(bwd, StaticRequest)

    def test_weight_consistency(self):
        tr = model.simulate(jax.random.key(0), ())
        request = StaticRequest({"a": Update(ChoiceMap.choice(0.5))})
        new_tr, w, _, _ = request.edit(jax.random.key(1), tr, Diff.no_change(()))
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)


@g.gen
def walk(c, _x):
    z = g.normal(c, 1.0) @ "z"
    return z, z


class TestVectorRequest:
    def test_vector_update_over_scan(self):
        """Per-step stacked Update requests: step t gets slice t of the
        stacked constraint (flag-masked so only step 2 is constrained)."""
        from genjax_tpu import Mask

        model = walk.scan(n=6)
        tr = model.simulate(jax.random.key(0), (0.0, None))
        flags = jnp.arange(6) == 2
        vals = jnp.full((6,), 9.0)
        stacked_constraint = ChoiceMap.kw(z=Mask(vals, flags))
        stacked_req = Update(stacked_constraint)
        req = VectorRequest(stacked_req)
        new_tr, w, _, bwd = req.edit(
            jax.random.key(1), tr, Diff.no_change((0.0, None))
        )
        old_z = tr.get_choices()["z"]
        new_z = new_tr.get_choices()["z"]
        assert jnp.allclose(new_z[2], 9.0)
        assert jnp.allclose(new_z[:2], old_z[:2])
        # downstream steps retain values (but are re-scored)
        assert jnp.allclose(new_z[3:], old_z[3:])
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)
        assert isinstance(bwd, VectorRequest)
