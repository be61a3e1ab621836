"""Sharded SVGD on the 8-device virtual mesh: exact parity with the
dense driver, posterior recovery, and a compiled-HLO check that the
per-step communication is exactly the two (N, D) all-gathers."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.svgd import svgd
from genjax_tpu.parallel.svgd import sharded_svgd

D = 4


@g.gen
def vector_model(y):
    w = g.normal(jnp.zeros(D), 1.0) @ "w"
    _ = g.normal(w, 0.5) @ "y"
    return w


Y = jnp.linspace(-1.0, 1.0, D)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("particles",))


class TestParity:
    def test_matches_dense_driver_exactly(self, mesh):
        """With an explicit bandwidth the distributed transport is the
        same arithmetic as the dense driver — identical particles."""
        kw = dict(n_particles=64, n_steps=50, step_size=0.2)
        dense, _ = svgd(
            jax.random.key(0), vector_model, (Y,), ChoiceMap.kw(y=Y),
            Selection.at["w"], bandwidth=1.0, **kw,
        )
        shard, _ = sharded_svgd(
            jax.random.key(0), vector_model, (Y,), ChoiceMap.kw(y=Y),
            Selection.at["w"], mesh=mesh, bandwidth=1.0, **kw,
        )
        assert jnp.allclose(
            dense.get_choices()["w"], shard.get_choices()["w"], atol=1e-5
        )

    def test_median_heuristic_recovers_posterior(self, mesh):
        traces, _ = sharded_svgd(
            jax.random.key(1), vector_model, (Y,), ChoiceMap.kw(y=Y),
            Selection.at["w"], n_particles=256, n_steps=400,
            step_size=0.2, mesh=mesh,
        )
        ws = traces.get_choices()["w"]
        post_mean = 4.0 * Y / 5.0
        assert jnp.max(jnp.abs(jnp.mean(ws, 0) - post_mean)) < 0.05
        assert jnp.max(jnp.abs(jnp.std(ws, 0) - 0.2**0.5)) < 0.08

    def test_indivisible_particles_raises(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            sharded_svgd(
                jax.random.key(0), vector_model, (Y,), ChoiceMap.kw(y=Y),
                Selection.at["w"], n_particles=100, n_steps=1, mesh=mesh,
            )


class TestCommunicationShape:
    def test_only_position_and_gradient_all_gathers(self, mesh):
        """The compiled transport program's all-gathers move (N, D)
        floats (positions + gradients) — never an N x N kernel block and
        nothing proportional to the observation payload."""
        n, d = 64, D

        lowered = jax.jit(
            lambda k: sharded_svgd(
                k, vector_model, (Y,), ChoiceMap.kw(y=Y),
                Selection.at["w"], n_particles=n, n_steps=3,
                step_size=0.2, mesh=mesh,
            )
        ).lower(jax.random.key(0))
        hlo = lowered.compile().as_text()
        gathers = [l for l in hlo.splitlines() if "all-gather(" in l]
        assert gathers, "expected all-gather collectives in the program"
        # every all-gather output is at most the full (N, D) matrix
        # (f32[64,4] = 1024 floats); nothing N x N (4096) or larger
        for line in gathers:
            m = re.search(r"f32\[([\d,]+)\]", line)
            assert m, line
            size = int(np.prod([int(s) for s in m.group(1).split(",")]))
            assert size <= n * d, f"oversized all-gather: {line}"
        # pmean of the bandwidth/diagnostic is scalar all-reduce; the
        # particle payload itself is never globally reduced
        assert "all-to-all" not in hlo
