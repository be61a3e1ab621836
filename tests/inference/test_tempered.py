"""Tempered SMC (inference/tempered.py): unbiased log-Z along the
temperature ladder, posterior recovery, tempered-MH correctness for both
Regenerate and gradient-based rejuvenation kernels."""

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Regenerate, Selection, Target
from genjax_tpu.inference.requests import MALA
from genjax_tpu.inference.tempered import TemperedSMC


@g.gen
def conjugate():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


TARGET = Target(conjugate, (), ChoiceMap.kw(y=1.0))
EXACT_LML = -0.25 - 0.5 * jnp.log(2 * jnp.pi * 2.0)


class TestTemperedConjugate:
    def test_collection_lml_accessor_matches_log_z(self):
        # The returned collection's weights must encode the evidence so the
        # standard accessor reports log_z, not the normalized-weight
        # constant -log K (round-2 advisor finding).
        smc = TemperedSMC(
            n_particles=256,
            betas=jnp.linspace(0.0, 1.0, 6),
            request=Regenerate(Selection.at["mu"]),
        )
        coll, log_z = jax.jit(smc.run)(jax.random.key(3), TARGET)
        acc = coll.get_log_marginal_likelihood_estimate()
        assert jnp.allclose(acc, log_z, atol=1e-5)
        coll2, log_z2, _ = jax.jit(
            lambda k: smc.run_adaptive(k, TARGET, n_steps=8)
        )(jax.random.key(4))
        acc2 = coll2.get_log_marginal_likelihood_estimate()
        assert jnp.allclose(acc2, log_z2, atol=1e-5)

    def test_log_z_unbiased(self):
        smc = TemperedSMC(
            n_particles=512,
            betas=jnp.linspace(0.0, 1.0, 8),
            request=Regenerate(Selection.at["mu"]),
            n_moves=2,
        )
        keys = jax.random.split(jax.random.key(0), 96)
        zs = jax.vmap(lambda k: smc.run(k, TARGET)[1])(keys)
        pooled = logsumexp(zs) - jnp.log(float(zs.shape[0]))
        assert jnp.abs(pooled - EXACT_LML) < 0.03, (pooled, EXACT_LML)

    def test_posterior_moments(self):
        smc = TemperedSMC(
            n_particles=2048,
            betas=jnp.linspace(0.0, 1.0, 10),
            request=Regenerate(Selection.at["mu"]),
            n_moves=2,
        )
        coll, _ = jax.jit(smc.run)(jax.random.key(1), TARGET)
        mus = coll.get_particles().get_choices()["mu"]
        # exact posterior N(0.5, 0.5)
        assert jnp.abs(jnp.mean(mus) - 0.5) < 0.08
        assert jnp.abs(jnp.var(mus) - 0.5) < 0.08

    def test_no_rejuvenation_still_unbiased(self):
        smc = TemperedSMC(
            n_particles=1024, betas=jnp.linspace(0.0, 1.0, 6), request=None
        )
        keys = jax.random.split(jax.random.key(2), 64)
        zs = jax.vmap(lambda k: smc.run(k, TARGET)[1])(keys)
        pooled = logsumexp(zs) - jnp.log(float(zs.shape[0]))
        assert jnp.abs(pooled - EXACT_LML) < 0.05

    def test_mala_rejuvenation(self):
        # MALA proposal noise is sqrt(2 eps): eps = 0.25 puts it at the
        # posterior scale so the ladder actually mixes.
        smc = TemperedSMC(
            n_particles=1024,
            betas=jnp.linspace(0.0, 1.0, 8),
            request=MALA(Selection.at["mu"], jnp.asarray(0.25)),
            n_moves=3,
        )
        coll, log_z = jax.jit(smc.run)(jax.random.key(3), TARGET)
        mus = coll.get_particles().get_choices()["mu"]
        assert jnp.abs(jnp.mean(mus) - 0.5) < 0.1
        assert jnp.abs(log_z - EXACT_LML) < 0.2


class TestTemperedHard:
    def test_data_conditioned_shared_args(self):
        """Tempering a data-conditioned regression target: shared-args
        layout flows through the ladder; log Z matches the conjugate
        closed form for Bayesian linear regression."""

        @g.gen
        def reg(X):
            w = g.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            _ = g.normal(X @ w, 1.0) @ "ys"

        X = jax.random.normal(jax.random.key(4), (8, 2))
        ys = jnp.ones(8)
        target = Target(reg, (X,), ChoiceMap.kw(ys=ys))
        # exact evidence: ys ~ N(0, I + X X^T)
        S = jnp.eye(8) + X @ X.T
        sign, logdet = jnp.linalg.slogdet(S)
        exact = (
            -0.5 * ys @ jnp.linalg.solve(S, ys)
            - 0.5 * logdet
            - 4.0 * jnp.log(2 * jnp.pi)
        )
        smc = TemperedSMC(
            n_particles=1024,
            betas=jnp.linspace(0.0, 1.0, 12),
            request=MALA(Selection.at["w"], jnp.asarray(0.02)),
            n_moves=3,
        )
        coll, _ = jax.jit(smc.run)(jax.random.key(5), target)
        assert coll.get_particles().get_args()[0].shape == (8, 2)
        keys = jax.random.split(jax.random.key(6), 48)
        zs = jax.vmap(lambda k: smc.run(k, target)[1])(keys)
        pooled = logsumexp(zs) - jnp.log(float(zs.shape[0]))
        assert jnp.abs(pooled - exact) < 0.25, (pooled, exact)

    def test_bimodal_posterior_covered(self):
        """A symmetric bimodal posterior (likelihood on |mu|): direct
        prior-proposal SIR collapses to one mode at small K; the
        tempered ladder keeps both."""

        @g.gen
        def bimodal():
            mu = g.normal(0.0, 3.0) @ "mu"
            _ = g.normal(jnp.abs(mu), 0.3) @ "y"

        target = Target(bimodal, (), ChoiceMap.kw(y=2.0))
        smc = TemperedSMC(
            n_particles=2048,
            betas=jnp.linspace(0.0, 1.0, 12),
            request=Regenerate(Selection.at["mu"]),
            n_moves=2,
        )
        coll, _ = jax.jit(smc.run)(jax.random.key(7), target)
        mus = coll.get_particles().get_choices()["mu"]
        frac_pos = jnp.mean(mus > 0)
        assert 0.25 < frac_pos < 0.75, frac_pos
        assert jnp.abs(jnp.mean(jnp.abs(mus)) - 2.0) < 0.25


class TestAdaptiveTempering:
    def test_adaptive_ladder_reaches_one_and_is_unbiased(self):
        @g.gen
        def tight():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.3) @ "y"

        target = Target(tight, (), ChoiceMap.kw(y=2.0))
        var = 1.0 + 0.09
        exact = -0.5 * 4.0 / var - 0.5 * jnp.log(2 * jnp.pi * var)
        smc = TemperedSMC(
            n_particles=1024,
            betas=jnp.linspace(0, 1, 2),  # ignored by run_adaptive
            request=Regenerate(Selection.at["mu"]),
            n_moves=2,
        )
        coll, _, betas = jax.jit(
            lambda k: smc.run_adaptive(k, target, n_steps=16)
        )(jax.random.key(0))
        # monotone ladder that saturates at 1
        assert jnp.all(jnp.diff(betas) >= -1e-6)
        assert jnp.allclose(betas[-1], 1.0)
        # evidence unbiased (pooled over runs)
        keys = jax.random.split(jax.random.key(1), 64)
        zs = jax.vmap(lambda k: smc.run_adaptive(k, target, n_steps=16)[1])(
            keys
        )
        pooled = logsumexp(zs) - jnp.log(64.0)
        assert jnp.abs(pooled - exact) < 0.05, (pooled, exact)
        # posterior mean
        mus = coll.get_particles().get_choices()["mu"]
        assert jnp.abs(jnp.mean(mus) - 2.0 / 1.09) < 0.1

    def test_adaptive_takes_fewer_effective_steps(self):
        @g.gen
        def tight():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.3) @ "y"

        target = Target(tight, (), ChoiceMap.kw(y=2.0))
        smc = TemperedSMC(
            n_particles=512,
            betas=jnp.linspace(0, 1, 2),
            request=Regenerate(Selection.at["mu"]),
        )
        _, _, betas = jax.jit(
            lambda k: smc.run_adaptive(k, target, n_steps=16)
        )(jax.random.key(2))
        effective = jnp.sum(jnp.diff(jnp.concatenate([jnp.zeros(1), betas])) > 1e-6)
        assert effective <= 6, betas


class TestAdaptiveForcedCompletion:
    def test_small_budget_still_reaches_one(self):
        """With a step budget too small for the ESS schedule, the final
        step force-jumps to beta = 1 (code-review finding: pre-fix the
        scan could return a still-tempered population silently)."""

        @g.gen
        def very_tight():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 0.05) @ "y"

        target = Target(very_tight, (), ChoiceMap.kw(y=2.5))
        smc = TemperedSMC(
            n_particles=256,
            betas=jnp.linspace(0, 1, 2),
            request=Regenerate(Selection.at["mu"]),
        )
        _, _, betas = jax.jit(
            lambda k: smc.run_adaptive(k, target, n_steps=3)
        )(jax.random.key(0))
        assert jnp.allclose(betas[-1], 1.0), betas
