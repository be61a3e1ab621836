"""Elliptical slice sampling: exactness against conjugate posteriors.

Oracles are closed-form normal-normal posteriors (the reference's
test idiom, tests/inference/test_requests.py) — ESS leaves the
posterior invariant and is tuning-free, so chains must recover the
exact posterior moments."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.mcmc import mh, mh_chain, run_chains
from genjax_tpu.inference.requests import EllipticalSlice, elliptical_slice


@g.gen
def scalar_model():
    mu = g.normal(1.0, 2.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "obs"
    return mu


# obs = 3.0: posterior N(2.6, 0.8) (precision-weighted combination).
SC_OBS = 3.0
SC_POST_MEAN = 2.6
SC_POST_STD = 0.8**0.5


def scalar_trace(key):
    tr, _ = scalar_model.importance(key, ChoiceMap.kw(obs=SC_OBS), ())
    return tr


class TestScalarConjugate:
    def test_chain_recovers_posterior(self):
        tr = scalar_trace(jax.random.key(0))
        req = EllipticalSlice(Selection.at["mu"], mean=1.0)
        _, mus = jax.jit(
            lambda k, t: mh_chain(
                k, t, req, 4000, collect=lambda t: t.get_choices()["mu"]
            )
        )(jax.random.key(1), tr)
        s = mus[500:]
        assert jnp.allclose(jnp.mean(s), SC_POST_MEAN, atol=0.1)
        assert jnp.allclose(jnp.std(s), SC_POST_STD, atol=0.1)

    def test_weight_is_zero_and_mh_always_accepts(self):
        tr = scalar_trace(jax.random.key(0))
        req = EllipticalSlice(Selection.at["mu"], mean=1.0)
        new_tr, w, _, _ = req.edit(
            jax.random.key(2), tr, g.Diff.no_change(())
        )
        assert float(w) == 0.0
        _, accepted = mh(jax.random.key(3), tr, req)
        assert bool(accepted)

    def test_functional_form_moves_state(self):
        tr = scalar_trace(jax.random.key(0))
        new_tr = elliptical_slice(
            jax.random.key(4), tr, Selection.at["mu"], mean=1.0
        )
        # A fresh trace from a different key almost surely moves.
        assert float(new_tr.get_choices()["mu"]) != float(
            tr.get_choices()["mu"]
        )

    def test_score_consistency_after_move(self):
        """The returned trace's score must equal a fresh assess of its
        choices (the edit is a real GFI edit, not a value overwrite)."""
        tr = scalar_trace(jax.random.key(0))
        new_tr = elliptical_slice(
            jax.random.key(5), tr, Selection.at["mu"], mean=1.0
        )
        score, _ = scalar_model.assess(new_tr.get_choices(), ())
        assert jnp.allclose(score, new_tr.get_score(), atol=1e-5)


D = 8


@g.gen
def vector_model(y):
    f = g.normal(jnp.full((D,), 0.5), 1.0) @ "f"
    _ = g.normal(f, 0.5) @ "y"
    return f


class TestVectorLatent:
    """iid vector site: per-dimension conjugate posterior
    N((0.5/1 + y/0.25)/(1 + 4), 1/(1+4))."""

    def test_chain_recovers_posterior(self):
        y = jnp.linspace(-1.0, 2.0, D)
        post_mean = (0.5 + 4.0 * y) / 5.0
        post_std = (1.0 / 5.0) ** 0.5
        tr, _ = vector_model.importance(
            jax.random.key(0), ChoiceMap.kw(y=y), (y,)
        )
        req = EllipticalSlice(Selection.at["f"], mean=0.5)
        _, fs = jax.jit(
            lambda k, t: mh_chain(
                k, t, req, 3000, collect=lambda t: t.get_choices()["f"]
            )
        )(jax.random.key(1), tr)
        s = fs[500:]
        assert jnp.max(jnp.abs(jnp.mean(s, 0) - post_mean)) < 0.12
        assert jnp.max(jnp.abs(jnp.std(s, 0) - post_std)) < 0.1


class TestVmappedChains:
    def test_run_chains(self):
        n_chains = 16
        keys = jax.random.split(jax.random.key(0), n_chains)
        traces = jax.vmap(scalar_trace)(keys)
        req = EllipticalSlice(Selection.at["mu"], mean=1.0)
        _, mus = jax.jit(
            lambda k, t: run_chains(
                k, t, req, 500, collect=lambda t: t.get_choices()["mu"]
            )
        )(jax.random.key(1), traces)
        s = mus[:, 100:]
        assert s.shape == (n_chains, 400)
        assert jnp.allclose(jnp.mean(s), SC_POST_MEAN, atol=0.1)
        assert jnp.allclose(jnp.std(s), SC_POST_STD, atol=0.1)
