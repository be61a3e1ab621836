"""Regression tests for the site-graph cache key (lang/analysis.py).

Two `partial_apply` variants of one source function can have different
dependency structure when a bound (concrete) argument steers Python
control flow during staging. The cache must not alias them — a stale hit
silently reuses the wrong subtraces and corrupts edit scores/weights.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as gx
from genjax_tpu.core.choice_map import ChoiceMap
from genjax_tpu.core.diff import Diff


@gx.gen
def _steered(flag, mu):
    x = gx.normal(mu, 1.0) @ "x"
    if flag:
        # Dependent: editing "x" must recompute "y"'s density.
        y = gx.normal(x, 1.0) @ "y"
    else:
        y = gx.normal(0.0, 1.0) @ "y"
    return y


def _update_x(model, mu, new_x):
    key = jax.random.key(0)
    tr = model.simulate(key, (mu,))
    new_tr, w, _, _ = model.edit(
        jax.random.key(1),
        tr,
        gx.Update(ChoiceMap.kw(x=new_x)),
        Diff.no_change((mu,)),
    )
    return tr, new_tr, w


class TestSiteGraphCacheKey:
    def test_partial_apply_variants_do_not_alias(self):
        indep = _steered.partial_apply(False)
        dep = _steered.partial_apply(True)

        # Prime the cache with the independent variant first — under the
        # old (dyn_args-blind) key this poisoned the dependent variant's
        # edit plan, which then reused "y"'s subtrace despite "x" changing.
        _update_x(indep, 0.3, 2.0)
        tr, new_tr, w = _update_x(dep, 0.3, 2.0)

        # Ground truth: score of the new trace must equal assess of its
        # choices, and the weight must be the full score delta (Update with
        # NoChange args and a constrained site).
        score, _ = dep.assess(new_tr.get_choices(), (0.3,))
        assert jnp.allclose(new_tr.get_score(), score, atol=1e-5)
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)

    def test_opposite_priming_order(self):
        dep = _steered.partial_apply(True)
        indep = _steered.partial_apply(False)

        _update_x(dep, -0.7, 1.0)
        tr, new_tr, w = _update_x(indep, -0.7, 1.0)
        score, _ = indep.assess(new_tr.get_choices(), (-0.7,))
        assert jnp.allclose(new_tr.get_score(), score, atol=1e-5)
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)
