"""NUTS (inference/requests/nuts.py): exact-oracle posterior recovery,
invariance under exact-posterior initialization, U-turn/divergence
behavior, warmup adaptation.

Statistical tolerances at >=4-6 standard errors per repo conventions.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.mcmc import mh_chain, run_chains
from genjax_tpu.inference.requests import NUTS
from genjax_tpu.inference.requests.nuts import nuts_kernel, nuts_warmup


@g.gen
def conjugate():
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, 1.0) @ "y"


POST_MEAN, POST_VAR = 0.5, 0.5


class TestNUTSInvariance:
    def test_exact_posterior_start_stays_exact(self):
        # The sharpest kernel-correctness check available: initialize
        # 4096 chains at EXACT posterior draws, apply 3 NUTS steps, and
        # verify the marginal did not move (any bias in the multinomial
        # selection, U-turn handling, or energy bookkeeping shifts it).
        n = 4096
        k_init, k_run = jax.random.split(jax.random.key(0))
        mus = POST_MEAN + jnp.sqrt(POST_VAR) * jax.random.normal(k_init, (n,))

        def make(k, mu):
            tr, _ = conjugate.importance(k, ChoiceMap.kw(y=1.0, mu=mu), ())
            return tr

        traces = jax.vmap(make)(jax.random.split(k_init, n), mus)
        req = NUTS(Selection.at["mu"], jnp.asarray(0.4), max_depth=5)
        traces, _ = jax.jit(
            lambda k, t: run_chains(k, t, req, 3)
        )(k_run, traces)
        out = traces.get_choices()["mu"]
        se_mean = jnp.sqrt(POST_VAR / n)
        assert jnp.abs(jnp.mean(out) - POST_MEAN) < 6 * se_mean
        # var of sample variance for normal: 2 sigma^4 / (n-1)
        se_var = jnp.sqrt(2 * POST_VAR**2 / (n - 1))
        assert jnp.abs(jnp.var(out) - POST_VAR) < 6 * se_var
        # third central moment is 0 for the normal posterior
        cm3 = jnp.mean((out - jnp.mean(out)) ** 3)
        se_cm3 = jnp.sqrt(6 * POST_VAR**3 / n)
        assert jnp.abs(cm3) < 6 * se_cm3


class TestNUTSPosterior:
    def test_conjugate_chain(self):
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        req = NUTS(Selection.at["mu"], jnp.asarray(0.5), max_depth=5)
        _, mus = jax.jit(
            lambda k, t: mh_chain(
                k, t, req, 4000, collect=lambda t: t.get_choices()["mu"]
            )
        )(jax.random.key(2), tr)
        mus = mus[500:]
        # NUTS decorrelates fast; be conservative on the ESS anyway.
        se = jnp.sqrt(POST_VAR / (mus.shape[0] / 10))
        assert jnp.abs(jnp.mean(mus) - POST_MEAN) < 6 * se
        assert jnp.abs(jnp.var(mus) - POST_VAR) < 0.1

    def test_correlated_gaussian_exact_cov(self):
        # mu1 ~ N(0,1); mu2 ~ N(mu1,1); y=2 observed from N(mu2,1).
        # Posterior precision [[2,-1],[-1,2]] => cov (1/3)[[2,1],[1,2]],
        # mean (2/3, 4/3).
        @g.gen
        def chain_model():
            mu1 = g.normal(0.0, 1.0) @ "mu1"
            mu2 = g.normal(mu1, 1.0) @ "mu2"
            _ = g.normal(mu2, 1.0) @ "y"

        tr, _ = chain_model.importance(
            jax.random.key(0), ChoiceMap.kw(y=2.0), ()
        )
        sel = Selection.at["mu1"] | Selection.at["mu2"]
        req = NUTS(sel, jnp.asarray(0.4), max_depth=6)
        _, out = jax.jit(
            lambda k, t: mh_chain(
                k, t, req, 6000,
                collect=lambda t: (
                    t.get_choices()["mu1"], t.get_choices()["mu2"]
                ),
            )
        )(jax.random.key(3), tr)
        m1, m2 = out[0][1000:], out[1][1000:]
        n_eff = m1.shape[0] / 10
        assert jnp.abs(jnp.mean(m1) - 2 / 3) < 6 * jnp.sqrt((2 / 3) / n_eff)
        assert jnp.abs(jnp.mean(m2) - 4 / 3) < 6 * jnp.sqrt((2 / 3) / n_eff)
        assert jnp.abs(jnp.var(m1) - 2 / 3) < 0.12
        assert jnp.abs(jnp.var(m2) - 2 / 3) < 0.12
        cov = jnp.mean((m1 - jnp.mean(m1)) * (m2 - jnp.mean(m2)))
        assert jnp.abs(cov - 1 / 3) < 0.12


class TestNUTSMechanics:
    def test_tiny_eps_reaches_max_depth(self):
        # From the posterior MEAN (flat gradient, no nearby reflection
        # point) a 15-step eps=0.01 trajectory covers a tiny fraction of
        # the oscillator period, so every doubling merges and depth hits
        # max_depth. (A tail start can legitimately U-turn early: the
        # trajectory spans its reflection point within a few steps.)
        tr, _ = conjugate.importance(
            jax.random.key(0), ChoiceMap.kw(y=1.0, mu=0.5), ()
        )
        _, info = nuts_kernel(
            jax.random.key(1), tr, Selection.at["mu"], 0.01, max_depth=4
        )
        assert int(info.depth) == 4
        assert not bool(info.diverged)
        assert 0.98 < float(info.accept_stat) <= 1.0

    def test_huge_eps_diverges_and_keeps_state(self):
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        mu0 = tr.get_choices()["mu"]
        new_tr, info = nuts_kernel(
            jax.random.key(1), tr, Selection.at["mu"], 1e4, max_depth=4
        )
        assert bool(info.diverged)
        # first leaf diverged => nothing merged => the draw is the start
        assert jnp.allclose(new_tr.get_choices()["mu"], mu0)

    def test_uturn_terminates_early(self):
        # At eps=0.6 on a unit-ish Gaussian the U-turn arrives after
        # ~pi/0.6 ~ 5 steps: depth must stop well short of max_depth 8.
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        depths = []
        for s in range(16):
            _, info = nuts_kernel(
                jax.random.key(s), tr, Selection.at["mu"], 0.6, max_depth=8
            )
            depths.append(int(info.depth))
        assert max(depths) <= 5, depths
        assert min(depths) >= 1, depths

    def test_observed_site_untouched_and_weight_zero(self):
        tr, _ = conjugate.importance(jax.random.key(0), ChoiceMap.kw(y=1.0), ())
        req = NUTS(Selection.at["mu"], jnp.asarray(0.3), max_depth=4)
        new_tr, w, _, bwd = req.edit(
            jax.random.key(1), tr, g.Diff.no_change(())
        )
        assert float(w) == 0.0
        assert jnp.allclose(new_tr.get_choices()["y"], 1.0)
        assert isinstance(bwd, NUTS)


class TestNUTSWarmup:
    def test_warmup_adapts_scale_and_mass(self):
        # Two latents with 100x different posterior scales: warmup must
        # find an inv_mass ratio reflecting it and land accept near
        # target.
        @g.gen
        def scaled():
            a = g.normal(0.0, 10.0) @ "a"
            b = g.normal(0.0, 0.1) @ "b"
            _ = g.normal(a + b, 5.0) @ "y"

        n = 64
        keys = jax.random.split(jax.random.key(0), n)
        traces, _ = jax.vmap(
            lambda k: scaled.importance(k, ChoiceMap.kw(y=1.0), ())
        )(keys)
        sel = Selection.at["a"] | Selection.at["b"]
        warmed, res = nuts_warmup(
            jax.random.key(1), traces, sel, n_steps=60, max_depth=5
        )
        assert float(res.eps) > 0
        ratio = float(res.inv_mass["a"]) / float(res.inv_mass["b"])
        # true posterior vars: a ~ 80 (10^2 vs obs sd 5), b ~ 0.01
        assert ratio > 100, ratio
        assert 0.5 < float(res.accept_rate) <= 1.0

    def test_sampling_with_warmed_kernel(self):
        n = 64
        keys = jax.random.split(jax.random.key(0), n)
        traces, _ = jax.vmap(
            lambda k: conjugate.importance(k, ChoiceMap.kw(y=1.0), ())
        )(keys)
        warmed, res = nuts_warmup(
            jax.random.key(1), traces, Selection.at["mu"],
            n_steps=45, max_depth=5,
        )
        req = NUTS(Selection.at["mu"], res.eps, 5, res.inv_mass)
        final, _ = run_chains(jax.random.key(2), warmed, req, 50)
        out = final.get_choices()["mu"]
        se = jnp.sqrt(POST_VAR / n)
        assert jnp.abs(jnp.mean(out) - POST_MEAN) < 6 * se
