"""ChEES trajectory-length adaptation: the criterion must grow T on
targets with long timescales, co-adapt eps to its acceptance target, and
the tuned kernel must stay exact (MH correctness is parameter-free)."""

import jax
import jax.numpy as jnp

import genjax_tpu as gx
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.chees import chees_warmup, run_chees_chains
from genjax_tpu.inference.diagnostics import split_rhat


@gx.gen
def ill_conditioned():
    x = gx.normal(0.0, 1.0) @ "x"
    y = gx.normal(0.0, 10.0) @ "y"


@gx.gen
def conjugate():
    mu = gx.normal(0.0, 1.0) @ "mu"
    _ = gx.normal(mu, 1.0) @ "obs"


class TestChEES:
    def test_grows_trajectory_on_ill_conditioned_target(self):
        """Unit mass on scales (1, 10): single-step proposals cannot
        traverse the slow coordinate; ChEES must push T well above its
        T0=1 start (the optimum is ~pi*sigma_max/2 ~ 15.7)."""
        keys = jax.random.split(jax.random.key(0), 128)
        trs = jax.vmap(lambda k: ill_conditioned.simulate(k, ()))(keys)
        sel = Selection.at["x"] | Selection.at["y"]
        warmed, res = jax.jit(
            lambda k, t: chees_warmup(
                k, t, sel, n_steps=200, adapt_mass=False, T0=1.0
            )
        )(jax.random.key(1), trs)
        assert float(res.trajectory_length) > 4.0, float(res.trajectory_length)
        assert 0.45 < float(res.accept_rate) < 0.85
        # sampling under the tuned kernel reaches both scales
        final, _ = run_chees_chains(jax.random.key(2), warmed, sel, res, 200)
        ch = final.get_choices()
        assert abs(float(jnp.var(ch["x"])) - 1.0) < 0.5
        assert abs(float(jnp.var(ch["y"])) - 100.0) < 50.0

    def test_posterior_exactness_with_mass(self):
        keys = jax.random.split(jax.random.key(3), 512)
        trs, _ = jax.vmap(
            lambda k: conjugate.importance(k, ChoiceMap.kw(obs=1.0), ())
        )(keys)
        sel = Selection.at["mu"]
        warmed, res = chees_warmup(jax.random.key(4), trs, sel, n_steps=120)
        final, _ = run_chees_chains(
            jax.random.key(5), warmed, sel, res, 300,
        )
        mus = final.get_choices()["mu"]
        se = float(jnp.sqrt(0.5 / 512))
        assert abs(float(jnp.mean(mus)) - 0.5) < 6 * se
        assert abs(float(jnp.var(mus)) - 0.5) < 0.15

    def test_no_resonance_fixed_point(self):
        """The jittered dynamic-length kernel must not freeze at a
        resonant trajectory (the failure mode fixed-L adaptation has;
        see test_adaptation.py): R-hat of the collected samples stays
        near 1."""
        keys = jax.random.split(jax.random.key(6), 64)
        trs, _ = jax.vmap(
            lambda k: conjugate.importance(k, ChoiceMap.kw(obs=1.0), ())
        )(keys)
        sel = Selection.at["mu"]
        warmed, res = chees_warmup(jax.random.key(7), trs, sel, n_steps=100)
        final, samples = run_chees_chains(
            jax.random.key(8), warmed, sel, res, 150,
            collect=lambda t: t.get_choices()["mu"],
        )
        # collect receives the BATCH: samples is (n_steps, n_chains)
        assert samples.shape == (150, 64)
        assert float(split_rhat(samples.T[:, 50:])) < 1.1

    def test_divergences_do_not_poison_adaptation(self):
        """Regression: a tiny-scale coordinate (sd 0.1) forces early
        divergences (inf endpoints) while eps is still large; the ChEES
        gradient must zero those chains' contributions explicitly —
        0 * inf is nan, and one nan permanently wedges the Adam state
        (T came back nan on every seed before the guard)."""

        @gx.gen
        def hard():
            a = gx.normal(0.0, 0.1) @ "a"
            b = gx.normal(0.0, 10.0) @ "b"

        keys = jax.random.split(jax.random.key(11), 128)
        trs = jax.vmap(lambda k: hard.simulate(k, ()))(keys)
        sel = Selection.at["a"] | Selection.at["b"]
        _, res = jax.jit(
            lambda k, t: chees_warmup(
                k, t, sel, n_steps=150, adapt_mass=False
            )
        )(jax.random.key(12), trs)
        assert bool(jnp.isfinite(res.trajectory_length)), "T went nan"
        # on a 100:1 conditioning ratio T must grow well past T0=1
        assert float(res.trajectory_length) > 8.0
        assert 0.45 < float(res.accept_rate) < 0.85

    def test_max_leapfrog_caps_work(self):
        keys = jax.random.split(jax.random.key(9), 32)
        trs = jax.vmap(lambda k: ill_conditioned.simulate(k, ()))(keys)
        sel = Selection.at["x"] | Selection.at["y"]
        # cap of 3 leapfrogs: still valid MCMC, just shorter trajectories
        warmed, res = chees_warmup(
            jax.random.key(10), trs, sel, n_steps=60, adapt_mass=False,
            max_leapfrog=3,
        )
        assert bool(jnp.isfinite(res.eps))
        assert bool(jnp.isfinite(res.trajectory_length))
