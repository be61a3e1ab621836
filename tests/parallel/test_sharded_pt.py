"""Sharded parallel tempering (parallel/pt.py): bit-exact vs the dense
path on the 8-device mesh, and HLO proof that replica state never
crosses devices (only the (T,)-float loglik vector and the small
collected statistic ride the ICI).
"""

import re

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection, Target
from genjax_tpu.inference.parallel_tempering import ParallelTempering
from genjax_tpu.inference.requests import GaussianDrift
from genjax_tpu.parallel import sharded_pt_run

D = 64  # per-replica payload (D floats) dwarfs the T-float loglik vector
T = 16


@g.gen
def wide_model():
    w = g.mv_normal_diag(jnp.zeros(D), jnp.ones(D)) @ "w"
    _ = g.normal(jnp.sum(w), 1.0) @ "y"


TARGET = Target(wide_model, (), ChoiceMap.kw(y=1.0))
PT = ParallelTempering(
    betas=jnp.exp(-0.35 * jnp.arange(T, dtype=jnp.float32)),
    request=GaussianDrift(Selection.at["w"], 0.4),
    n_moves=2,
)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(jax.devices()[:8], ("replicas",))


def _collect(tr):
    return jnp.sum(tr.get_choices()["w"])


class TestShardedPT:
    def test_bit_exact_vs_dense(self, mesh):
        key = jax.random.key(42)
        dense = jax.jit(
            lambda k: PT.run(k, TARGET, 40, collect=_collect)
        )(key)
        sharded = jax.jit(
            lambda k: sharded_pt_run(
                k, PT, TARGET, 40, mesh, collect=_collect
            )
        )(key)
        assert jnp.array_equal(dense.perm, sharded.perm)
        assert jnp.array_equal(dense.collected, sharded.collected)
        assert jnp.array_equal(dense.logliks, sharded.logliks)
        assert jnp.array_equal(dense.swap_rates, sharded.swap_rates)
        for a, b in zip(
            jax.tree_util.tree_leaves(dense.traces),
            jax.tree_util.tree_leaves(sharded.traces),
        ):
            assert jnp.array_equal(a, b)

    def test_replica_state_never_crosses_devices(self, mesh):
        fn = jax.jit(
            lambda k: sharded_pt_run(k, PT, TARGET, 8, mesh, collect=_collect)
        )
        hlo = fn.lower(jax.random.key(0)).compile().as_text()
        # Every all-gather's operand must be small: the T-float logliks,
        # the T-float collected stats, or tuples thereof — never the
        # (T/8, D) replica payload.
        for m in re.finditer(r"all-gather\(([^)]*)\)", hlo):
            for shape in re.findall(r"f32\[([\d,]*)\]", m.group(0)):
                dims = [int(d) for d in shape.split(",") if d]
                n_elts = 1
                for d in dims:
                    n_elts *= d
                assert n_elts <= T, (
                    f"all-gather moves {n_elts} floats (> T={T}): replica "
                    f"state is crossing devices\n{m.group(0)}"
                )
        # No all-to-all / collective-permute of state either.
        assert "all-to-all" not in hlo
        # Sanity: the exchange collective exists at all.
        assert "all-gather" in hlo

    def test_posterior_recovery_sharded(self, mesh):
        # Conjugate check through the sharded path end-to-end: the cold
        # chain targets N(0.5, 0.5) on mu.
        @g.gen
        def conj():
            mu = g.normal(0.0, 1.0) @ "mu"
            _ = g.normal(mu, 1.0) @ "y"

        target = Target(conj, (), ChoiceMap.kw(y=1.0))
        pt = ParallelTempering(
            betas=jnp.array([1.0, 0.6, 0.3, 0.1] * 2),
            request=GaussianDrift(Selection.at["mu"], 0.8),
        )
        out = jax.jit(
            lambda k: sharded_pt_run(
                k, pt, target, 3000, mesh,
                collect=lambda t: t.get_choices()["mu"],
            )
        )(jax.random.key(7))
        samples = out.collected[500:]
        se = jnp.sqrt(0.5 / (samples.shape[0] / 25))
        assert jnp.abs(jnp.mean(samples) - 0.5) < 6 * se
        assert jnp.abs(jnp.var(samples) - 0.5) < 0.15

    def test_uneven_replica_count_rejected(self, mesh):
        pt = ParallelTempering(
            betas=jnp.linspace(1.0, 0.1, 6),
            request=GaussianDrift(Selection.at["w"], 0.4),
        )
        with pytest.raises(ValueError, match="divide evenly"):
            sharded_pt_run(jax.random.key(0), pt, TARGET, 4, mesh)
