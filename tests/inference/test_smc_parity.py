"""SMC/distribution parity pins (reference tests/inference/test_smc.py,
tests/generative_functions/test_distributions.py): flip-flip exact
marginals (including a `lax.cond`-dependent likelihood), Marginal
rejection by Target, the direct GFI on distributions, and the
implicit-logit deprecation warning."""

import warnings

import jax
import jax.numpy as jnp
import pytest
from jax.scipy.special import logsumexp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff, Target
from genjax_tpu.inference.smc import Importance, ImportanceK

C = g.ChoiceMapBuilder
KEY = jax.random.key(314159)


class TestExactFlipFlip:
    def test_exact_flip_flip_trivial(self):
        @g.gen
        def flip_flip_trivial():
            _ = g.flip(0.5) @ "x"
            _ = g.flip(0.7) @ "y"

        target = Target(flip_flip_trivial, (), C["y"].set(True))
        exact = jnp.log(0.7)
        z1 = Importance(target).log_marginal_likelihood_estimate(KEY)
        # x and y are independent: even ONE particle is exact.
        assert jnp.allclose(z1, exact, atol=1e-5)
        zk = ImportanceK(
            target, k_particles=1000
        ).log_marginal_likelihood_estimate(KEY)
        assert jnp.allclose(zk, exact, atol=1e-3)

    def test_exact_flip_flip_cond_likelihood(self):
        @g.gen
        def flip_flip():
            v1 = g.flip(0.5) @ "x"
            p = jax.lax.cond(v1, lambda: 0.9, lambda: 0.3)
            _ = g.flip(p) @ "y"

        target = Target(flip_flip, (), C["y"].set(True))
        exact = logsumexp(jnp.log(jnp.array([0.5 * 0.9, 0.5 * 0.3])))
        zk = ImportanceK(
            target, k_particles=4000
        ).log_marginal_likelihood_estimate(KEY)
        assert jnp.allclose(zk, exact, atol=2e-2)

    def test_random_weighted_estimate_logpdf_consistency(self):
        @g.gen
        def flip_flip_trivial():
            _ = g.flip(0.5) @ "x"
            _ = g.flip(0.7) @ "y"

        target = Target(flip_flip_trivial, (), C["y"].set(True))
        alg = ImportanceK(target, k_particles=64)
        w, latents = alg.random_weighted(KEY, target)
        # E[p(x)/w] = 1 identity at a fully-discrete target: w must be a
        # finite posterior-density estimate of the drawn latents.
        assert jnp.isfinite(w)
        assert "x" in latents


class TestTargetRestrictions:
    def test_target_rejects_marginal(self):
        @g.gen
        def model():
            idx = g.categorical(probs=[0.5, 0.25, 0.25]) @ "idx"
            means = jnp.array([0.0, 10.0, 11.0])
            return g.normal(means[idx], 1.0) @ "x"

        marginal_model = model.marginal(selection=g.Selection.at["x"])
        with pytest.raises(TypeError):
            Target(marginal_model, (), C["x"].set(1.0))


class TestDistributionDirectGFI:
    """Distributions are full generative functions on their own
    (reference test_distributions.py:simulate/importance/update)."""

    def test_simulate_importance_update(self):
        tr = g.normal.simulate(KEY, (0.0, 1.0))
        assert jnp.isfinite(tr.get_score())

        tr, w = g.normal.importance(KEY, ChoiceMap.choice(1.0), (0.0, 1.0))
        exact = -0.5 - 0.5 * jnp.log(2 * jnp.pi)
        assert jnp.allclose(w, exact, atol=1e-6)

        new_tr, w2, _, bwd = tr.update(
            KEY,
            ChoiceMap.choice(2.0),
            (Diff.no_change(0.0), Diff.no_change(1.0)),
        )
        assert jnp.allclose(
            w2, new_tr.get_score() - tr.get_score(), atol=1e-6
        )
        assert jnp.allclose(new_tr.get_retval(), 2.0)

    def test_bare_logit_argument_warns(self):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")

            @g.gen
            def bmodel():
                return g.bernoulli(0.3) @ "b"

            bmodel.simulate(KEY, ())
        assert any(
            issubclass(w.category, DeprecationWarning) for w in rec
        ), "bare bernoulli argument must warn about implicit logits"
