"""ABC: likelihood-free inference against the conjugate oracle.

As tolerance -> 0 the ABC posterior converges to the true posterior;
with a conjugate normal toy the exact moments pin both the rejection
and the adaptive SMC samplers."""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import Selection
from genjax_tpu.inference.abc import ABCSMC, abc_rejection


@g.gen
def model():
    t = g.normal(0.0, 1.0) @ "theta"
    _ = g.normal(t, 0.5) @ "y"


SUMMARY = lambda tr: tr.get_choices()["y"]
# exact posterior given y=1: N(0.8, 0.2)
POST_MEAN, POST_STD = 0.8, 0.2**0.5


class TestABCSMC:
    def test_recovers_conjugate_posterior(self):
        alg = ABCSMC(
            model,
            (),
            Selection.at["theta"],
            summary_fn=SUMMARY,
            observed_summary=1.0,
            n_particles=4096,
            n_generations=8,
            n_moves=5,
        )
        out = jax.jit(alg.run)(jax.random.key(0))
        th = out["traces"].get_choices()["theta"]
        assert abs(float(jnp.mean(th)) - POST_MEAN) < 0.1
        assert abs(float(jnp.std(th)) - POST_STD) < 0.12
        # tolerance schedule is strictly decreasing and the population
        # respects the final tolerance
        eps = out["epsilons"]
        assert bool((eps[1:] < eps[:-1]).all())
        assert bool((out["distances"] <= eps[-1]).all())
        assert 0.02 < float(out["accept_rate"]) < 0.95

    def test_degenerate_distances_stay_finite(self):
        """A constant summary makes every distance identical, so the
        tolerance quantile EQUALS the minimum — the <= survivor rule
        must keep the population alive instead of softmaxing all -inf
        weights into NaN."""

        @g.gen
        def degenerate():
            t = g.normal(0.0, 1.0) @ "theta"
            _ = g.normal(t, 0.5) @ "y"

        alg = ABCSMC(
            degenerate,
            (),
            Selection.at["theta"],
            summary_fn=lambda tr: 0.0,  # ignores the data entirely
            observed_summary=0.0,
            n_particles=128,
            n_generations=4,
            n_moves=2,
        )
        out = alg.run(jax.random.key(3))
        th = out["traces"].get_choices()["theta"]
        assert bool(jnp.isfinite(th).all())
        assert bool(jnp.isfinite(out["epsilons"]).all())

    def test_shared_args_layout(self):
        """Model args are stored once, not broadcast per particle
        (CLAUDE.md shared-args convention for batch drivers)."""
        data = jnp.linspace(-1.0, 1.0, 7)

        @g.gen
        def with_data(xs):
            t = g.normal(0.0, 1.0) @ "theta"
            _ = g.normal(t * xs, 0.5) @ "y"

        alg = ABCSMC(
            with_data,
            (data,),
            Selection.at["theta"],
            summary_fn=lambda tr: tr.get_choices()["y"],
            observed_summary=jnp.zeros(7),
            n_particles=32,
            n_generations=2,
            n_moves=1,
        )
        out = alg.run(jax.random.key(4))
        (arg_leaf,) = jax.tree_util.tree_leaves(out["traces"].get_args())
        assert arg_leaf.shape == (7,)  # no leading particle axis

    def test_jits_and_vmaps(self):
        alg = ABCSMC(
            model,
            (),
            Selection.at["theta"],
            summary_fn=SUMMARY,
            observed_summary=1.0,
            n_particles=64,
            n_generations=3,
            n_moves=2,
        )
        outs = jax.vmap(alg.run)(jax.random.split(jax.random.key(1), 4))
        assert outs["epsilons"].shape == (4, 3)


class TestRejection:
    def test_accepted_mean_matches_posterior(self):
        rej = abc_rejection(
            jax.random.key(1), model, (), SUMMARY, 1.0,
            tolerance=0.1, n_particles=20000,
        )
        m = rej["accepted"]
        assert float(rej["accept_rate"]) > 0.01
        est = float(
            jnp.sum(rej["traces"].get_choices()["theta"] * m) / jnp.sum(m)
        )
        assert abs(est - POST_MEAN) < 0.1
        # distances of accepted particles respect the tolerance
        assert bool((jnp.where(m, rej["distances"], 0.0) < 0.1).all())
