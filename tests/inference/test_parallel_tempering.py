"""Parallel tempering (inference/parallel_tempering.py) and the
GaussianDrift request (inference/requests/drift.py): exact-oracle
posterior recovery, re-tempering identities, DEO exchange bookkeeping.

Statistical tolerances at >=4-6 standard errors per repo conventions.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection, Target
from genjax_tpu.inference.mcmc import mh, mh_chain
from genjax_tpu.inference.parallel_tempering import (
    ParallelTempering,
    tempered_mh,
)
from genjax_tpu.inference.requests import GaussianDrift


@g.gen
def conjugate():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


TARGET = Target(conjugate, (), ChoiceMap.kw(y=1.0))
POST_MEAN, POST_VAR = 0.5, 0.5


class TestGaussianDrift:
    def test_weight_is_mh_ratio_for_symmetric_proposal(self):
        # For a symmetric proposal the MH log-ratio is the joint score
        # delta, which is exactly what Update returns.
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        req = GaussianDrift(Selection.at["mu"], 0.7)
        key = jax.random.key(1)
        new_tr, w, _, _ = req.edit(
            key, tr, g.Diff.no_change(tr.get_args())
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)
        # The observed address is untouched.
        assert jnp.allclose(
            new_tr.get_choices()["y"], tr.get_choices()["y"]
        )

    def test_posterior_recovery_via_mh_chain(self):
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        req = GaussianDrift(Selection.at["mu"], 0.8)
        n = 6000
        _, samples = mh_chain(
            jax.random.key(2), tr, req, n,
            collect=lambda t: t.get_choices()["mu"],
        )
        samples = samples[1000:]
        # Effective sample size is well below n; use a generous se floor.
        se = jnp.sqrt(POST_VAR / (samples.shape[0] / 20))
        assert jnp.abs(jnp.mean(samples) - POST_MEAN) < 6 * se
        assert jnp.abs(jnp.var(samples) - POST_VAR) < 0.12

    def test_per_leaf_scale_tree(self):
        @g.gen
        def two_site():
            a = g.normal(0.0, 1.0) @ "a"
            b = g.normal(0.0, 1.0) @ "b"
            _ = g.normal(a + b, 1.0) @ "y"

        tr, _ = two_site.importance(jax.random.key(0), ChoiceMap.kw(y=0.0), ())
        sel = Selection.at["a"] | Selection.at["b"]
        values = tr.get_choices().filter(sel)
        scales = jax.tree_util.tree_map(lambda _: jnp.asarray(0.3), values)
        req = GaussianDrift(sel, scales)
        new_tr, w, _, _ = req.edit(
            jax.random.key(3), tr, g.Diff.no_change(())
        )
        assert jnp.isfinite(w)
        assert not jnp.allclose(
            new_tr.get_choices()["a"], tr.get_choices()["a"]
        )

    def test_composes_with_mh_under_jit(self):
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        req = GaussianDrift(Selection.at["mu"], 0.5)
        step = jax.jit(lambda k, t: mh(k, t, req))
        new_tr, accepted = step(jax.random.key(4), tr)
        assert accepted.dtype == jnp.bool_


class TestTemperedMH:
    def test_beta_one_matches_plain_mh_acceptance(self):
        # At beta=1 the bridge IS the joint, so tempered_mh must make the
        # same accept/reject decision as plain mh given the same key.
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        req = GaussianDrift(Selection.at["mu"], 0.9)
        obs = Selection.at["y"]
        for seed in range(8):
            key = jax.random.key(seed + 10)
            t1, _, acc1 = tempered_mh(key, tr, req, jnp.asarray(1.0), obs)
            # Replicate the decision manually with the same key splits.
            k_move, _, k_acc = jax.random.split(key, 3)
            prop, w, _, _ = req.edit(
                k_move, tr, g.Diff.no_change(tr.get_args())
            )
            acc_ref = jnp.log(jax.random.uniform(k_acc)) < w
            assert bool(acc1) == bool(acc_ref)
            got = t1.get_choices()["mu"]
            want = jnp.where(
                acc_ref, prop.get_choices()["mu"], tr.get_choices()["mu"]
            )
            assert jnp.allclose(got, want)

    def test_beta_zero_targets_prior(self):
        # At beta=0 the bridge is the prior: a long tempered_mh chain on
        # mu should match N(0, 1), not the posterior N(0.5, 0.5).
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        req = GaussianDrift(Selection.at["mu"], 1.2)
        obs = Selection.at["y"]

        def step(carry, key):
            t, ll = carry
            t, ll, _ = tempered_mh(key, t, req, jnp.asarray(0.0), obs, ll)
            return (t, ll), t.get_choices()["mu"]

        ll0 = tr.project(jax.random.key(1), obs)
        keys = jax.random.split(jax.random.key(5), 6000)
        _, samples = jax.lax.scan(step, (tr, ll0), keys)
        samples = samples[1000:]
        se = jnp.sqrt(1.0 / (samples.shape[0] / 20))
        assert jnp.abs(jnp.mean(samples)) < 6 * se
        assert jnp.abs(jnp.var(samples) - 1.0) < 0.15


class TestParallelTempering:
    def test_cold_chain_posterior_and_bookkeeping(self):
        pt = ParallelTempering(
            betas=jnp.array([1.0, 0.6, 0.3, 0.1]),
            request=GaussianDrift(Selection.at["mu"], 0.8),
            n_moves=2,
        )
        out = jax.jit(
            lambda k: pt.run(
                k, TARGET, 3000, collect=lambda t: t.get_choices()["mu"]
            )
        )(jax.random.key(7))
        samples = out.collected[500:]
        se = jnp.sqrt(POST_VAR / (samples.shape[0] / 25))
        assert jnp.abs(jnp.mean(samples) - POST_MEAN) < 6 * se
        assert jnp.abs(jnp.var(samples) - POST_VAR) < 0.15
        # perm stays a valid permutation of the replica ids.
        assert jnp.array_equal(jnp.sort(out.perm), jnp.arange(4))
        # Adjacent rungs this close must exchange at a healthy rate.
        assert jnp.all(out.swap_rates > 0.05), out.swap_rates

    def test_bimodal_mixing_beats_cold_only(self):
        # Posterior over mu is bimodal (y ~ N(mu^2, .)); a cold drift
        # chain started in one mode rarely crosses, PT does.
        @g.gen
        def bimodal():
            mu = g.normal(0.0, 2.0) @ "mu"
            _ = g.normal(mu * mu, 0.3) @ "y"

        target = Target(bimodal, (), ChoiceMap.kw(y=4.0))  # modes near +-2
        start = ChoiceMap.kw(y=4.0, mu=2.0)
        req = GaussianDrift(Selection.at["mu"], 0.5)

        pt = ParallelTempering(
            betas=jnp.array([1.0, 0.5, 0.25, 0.1, 0.02]),
            request=req,
            n_moves=2,
        )
        out = pt.run(
            jax.random.key(11), target, 4000,
            collect=lambda t: t.get_choices()["mu"],
            init_constraint=ChoiceMap.kw(mu=2.0),
        )
        pt_neg = jnp.mean(out.collected[500:] < 0.0)
        # Both modes visited substantially (symmetric posterior).
        assert 0.1 < pt_neg < 0.9, pt_neg

        # Cold-only chain from the same start stays in the + mode.
        tr, _ = bimodal.importance(jax.random.key(0), start, ())
        _, cold = mh_chain(
            jax.random.key(12), tr, req, 4000,
            collect=lambda t: t.get_choices()["mu"],
        )
        cold_neg = jnp.mean(cold[500:] < 0.0)
        assert cold_neg < pt_neg, (cold_neg, pt_neg)

    def test_request_fn_ladder_adapted_scales(self):
        pt = ParallelTempering(
            betas=jnp.array([1.0, 0.4, 0.1]),
            request_fn=lambda beta: GaussianDrift(
                Selection.at["mu"], 0.5 / jnp.sqrt(beta)
            ),
        )
        out = pt.run(
            jax.random.key(13), TARGET, 600,
            collect=lambda t: t.get_choices()["mu"],
        )
        assert out.collected.shape == (600,)
        assert jnp.all(jnp.isfinite(out.collected))
