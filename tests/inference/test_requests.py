"""MCMC edit-request convergence tests against conjugate posteriors
(parity: reference tests/inference/test_requests.py idioms)."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Regenerate, Selection
from genjax_tpu.inference.mcmc import mh, mh_chain, run_chains
from genjax_tpu.inference.requests import HMC, MALA, Rejuvenate


@g.gen
def normal_normal():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "obs"
    return mu


# Posterior given obs=y: N(y/2, 1/sqrt(2)).
OBS = 2.0
POST_MEAN = 1.0
POST_STD = 1.0 / jnp.sqrt(2.0)


def init_trace(key):
    tr, _ = normal_normal.importance(key, ChoiceMap.kw(obs=OBS), ())
    return tr


class TestRegenerateMH:
    def test_chain_converges_to_posterior(self):
        key = jax.random.key(0)
        tr = init_trace(key)
        req = Regenerate(Selection.at["mu"])
        final, mus = jax.jit(
            lambda k, t: mh_chain(k, t, req, 2000, collect=lambda tr: tr.get_choices()["mu"])
        )(jax.random.key(1), tr)
        samples = mus[500:]
        assert jnp.allclose(jnp.mean(samples), POST_MEAN, atol=0.1)
        assert jnp.allclose(jnp.std(samples), POST_STD, atol=0.1)

    def test_mh_accept_flag(self):
        tr = init_trace(jax.random.key(0))
        req = Regenerate(Selection.at["mu"])
        new_tr, accepted = mh(jax.random.key(2), tr, req)
        assert accepted.dtype == jnp.bool_


class TestRejuvenate:
    def test_random_walk_rejuvenation(self):
        @g.gen
        def proposal(prev_mu):
            return g.normal(prev_mu, 0.5) @ "mu"

        req = Rejuvenate(proposal, lambda chm: (chm["mu"],))
        tr = init_trace(jax.random.key(0))
        final, mus = jax.jit(
            lambda k, t: mh_chain(
                k, t, req, 8000, collect=lambda tr: tr.get_choices()["mu"]
            )
        )(jax.random.key(5), tr)
        samples = mus[1000:]
        assert jnp.allclose(jnp.mean(samples), POST_MEAN, atol=0.1)
        assert jnp.allclose(jnp.std(samples), POST_STD, atol=0.1)


class TestHMC:
    def test_alpha_is_detailed_balance_ratio(self):
        tr = init_trace(jax.random.key(0))
        req = HMC(Selection.at["mu"], jnp.array(0.1), L=5)
        new_tr, alpha, _, bwd = req.edit(
            jax.random.key(1), tr, g.Diff.no_change(tr.get_args())
        )
        assert jnp.isfinite(alpha)
        assert isinstance(bwd, HMC)

    def test_chain_converges(self):
        tr = init_trace(jax.random.key(0))
        req = HMC(Selection.at["mu"], jnp.array(0.3), L=10)
        final, mus = jax.jit(
            lambda k, t: mh_chain(k, t, req, 1000, collect=lambda tr: tr.get_choices()["mu"])
        )(jax.random.key(1), tr)
        samples = mus[200:]
        assert jnp.allclose(jnp.mean(samples), POST_MEAN, atol=0.12)
        assert jnp.allclose(jnp.std(samples), POST_STD, atol=0.12)


class TestMALA:
    def test_chain_converges(self):
        tr = init_trace(jax.random.key(0))
        req = MALA(Selection.at["mu"], jnp.array(0.25))
        final, mus = jax.jit(
            lambda k, t: mh_chain(k, t, req, 2000, collect=lambda tr: tr.get_choices()["mu"])
        )(jax.random.key(3), tr)
        samples = mus[500:]
        assert jnp.allclose(jnp.mean(samples), POST_MEAN, atol=0.1)
        assert jnp.allclose(jnp.std(samples), POST_STD, atol=0.12)


class TestRunChains:
    def test_parallel_chains(self):
        keys = jax.random.split(jax.random.key(0), 32)
        trs = jax.vmap(init_trace)(keys)
        req = Regenerate(Selection.at["mu"])
        finals, mus = jax.jit(
            lambda k, t: run_chains(k, t, req, 300, collect=lambda tr: tr.get_choices()["mu"])
        )(jax.random.key(1), trs)
        assert mus.shape == (32, 300)
        pooled = mus[:, 100:].reshape(-1)
        assert jnp.allclose(jnp.mean(pooled), POST_MEAN, atol=0.05)
