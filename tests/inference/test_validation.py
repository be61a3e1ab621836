"""SBC and Geweke kernel validation (inference/validation.py).

Both harnesses are themselves statistical tests, so each is checked in
both directions: a correct kernel passes comfortably, and a kernel with
a planted bug fails decisively. Thresholds sit far apart (p > 1e-3 vs
p < 1e-8; |z| < 5 vs |z| > 10) so suite-level false alarms are
negligible at fixed seeds."""

import jax
import jax.numpy as jnp
import jax.random as jrand
import pytest

import genjax_tpu as gx
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.gfi import Update
from genjax_tpu.inference.validation import SBCResult, geweke, sbc


@gx.gen
def nn_model():
    mu = gx.normal(0.0, 1.0) @ "mu"
    _ = gx.normal(mu, 1.0) @ "y"


LATENTS = gx.Selection.at["mu"]


def _always_accept(update_fn):
    """Kernel that replaces `mu` by `update_fn(key, trace)` with no MH
    correction — the planted-bug construction kit."""

    def kernel(key, tr):
        k1, k2 = jrand.split(key)
        new_mu = update_fn(k1, tr)
        new_tr, _, _, _ = Update(gx.ChoiceMap.kw(mu=new_mu)).edit(
            k2, tr, Diff.no_change(tr.get_args())
        )
        return new_tr

    return kernel


class TestSBC:
    def test_correct_kernel_ranks_uniform(self):
        res = sbc(
            jax.random.key(0), nn_model, (), LATENTS,
            gx.Regenerate(LATENTS),
            n_replicates=512, n_draws=19, thin=3,
        )
        assert res.ranks.shape == (512, 1)
        assert int(res.ranks.min()) >= 0 and int(res.ranks.max()) <= 19
        stat, p = res.uniformity()
        assert float(p[0]) > 1e-3, (float(stat[0]), float(p[0]))

    def test_wrong_posterior_fails(self):
        # Independence draws around y (true conditional mean is y/2,
        # sd sqrt(1/2)): stationary at the wrong posterior.
        bad = _always_accept(
            lambda k, tr: tr.get_choices()["y"] + 0.3 * jrand.normal(k)
        )
        res = sbc(
            jax.random.key(2), nn_model, (), LATENTS, bad,
            n_replicates=512, n_draws=19,
        )
        _, p = res.uniformity()
        assert float(p[0]) < 1e-8

    def test_identity_kernel_is_invariant_so_passes(self):
        # SBC checks INVARIANCE, not ergodicity: the identity kernel
        # trivially leaves the posterior invariant, and the consistent
        # tie-breaking augmentation (rank | u0 ~ Binomial(L, u0), which
        # is marginally uniform) keeps its ranks exactly uniform. Mixing
        # failures are the job of ESS/R-hat, not SBC.
        stuck = lambda key, tr: tr  # noqa: E731
        res = sbc(
            jax.random.key(3), nn_model, (), LATENTS, stuck,
            n_replicates=512, n_draws=19,
        )
        _, p = res.uniformity()
        assert float(p[0]) > 1e-3

    def test_histogram_counts_and_bins(self):
        res = SBCResult(
            ranks=jnp.array([[0], [1], [19], [10]], dtype=jnp.int32),
            n_draws=19,
        )
        hist = res.histogram(n_bins=4)  # bins of width 5
        assert hist.shape == (1, 4)
        assert jnp.allclose(hist[0], jnp.array([2.0, 0.0, 1.0, 1.0]))
        with pytest.raises(ValueError, match="n_bins"):
            res.uniformity(n_bins=100)

    def test_unequal_bin_widths_keep_exact_uniformity(self):
        # Regression: with (n_draws + 1) % n_bins != 0, integer binning
        # gives unequal-width bins; the chi-square must use per-bin
        # expected counts or exactly-uniform ranks (a correct kernel)
        # get rejected. Advisor round 3, high severity.
        for n_draws in (30, 100):
            ranks = jnp.tile(jnp.arange(n_draws + 1), 10)[:, None]
            res = SBCResult(ranks=ranks, n_draws=n_draws)
            stat, p = res.uniformity(n_bins=20)
            assert float(stat[0]) < 1e-4, (n_draws, float(stat[0]))
            assert float(p[0]) > 0.999
        # And a degenerate (all-zero) rank set still rejects decisively.
        res = SBCResult(
            ranks=jnp.zeros((310, 1), dtype=jnp.int32), n_draws=30
        )
        _, p = res.uniformity(n_bins=20)
        assert float(p[0]) < 1e-8

    def test_custom_summaries_and_shapes(self):
        res = sbc(
            jax.random.key(4), nn_model, (), LATENTS,
            gx.Regenerate(LATENTS),
            n_replicates=32, n_draws=7,
            summaries=lambda tr: jnp.stack(
                [tr.get_choices()["mu"], tr.get_choices()["mu"] ** 2]
            ),
        )
        assert res.ranks.shape == (32, 2)


class TestGeweke:
    def test_correct_kernel_passes(self):
        res = geweke(
            jax.random.key(1), nn_model, (), LATENTS,
            gx.Regenerate(LATENTS),
            n_forward=4096, n_steps=512, n_chains=8,
        )
        # Default summaries: (mu, y) and their squares.
        assert res.z_scores.shape == (4,)
        assert float(res.max_abs_z()) < 5.0, res.z_scores

    def test_wrong_conditional_fails(self):
        # Stationary but wrong p(mu | y): shrinks the joint's mu
        # variance, which the second-moment z-scores flag.
        bad = _always_accept(
            lambda k, tr: tr.get_choices()["y"] / 2.0
            + 0.1 * jrand.normal(k)
        )
        res = geweke(
            jax.random.key(1), nn_model, (), LATENTS, bad,
            n_forward=4096, n_steps=512, n_chains=8,
        )
        assert float(res.max_abs_z()) > 10.0, res.z_scores

    def test_ess_guards_nonstationary_chain(self):
        # An uncorrected random walk has no stationary distribution; the
        # autocorrelation ESS collapses, keeping z honest (finite) while
        # the chain mean still drifts away from the forward mean.
        bad = _always_accept(
            lambda k, tr: tr.get_choices()["mu"] + 0.5 * jrand.normal(k)
        )
        res = geweke(
            jax.random.key(5), nn_model, (), LATENTS, bad,
            n_forward=1024, n_steps=256, n_chains=8,
        )
        assert bool(jnp.all(jnp.isfinite(res.z_scores)))
        # mu^2 (summary 2) under the walk dwarfs the prior's E[mu^2]=1.
        assert float(res.mean_chain[2]) > 3.0 * float(res.mean_forward[2])
