"""Data-sharded likelihoods: the shared-args layout composes with
GSPMD so a big shared data operand can be sharded over the mesh while
chains stay vectorized — no framework changes, no shard_map.

Pinned here: (i) sharded and dense runs agree, (ii) the compiled HMC
program's cross-device traffic is only chain-sized gradient/score
all-reduces — the data matrix itself is never all-gathered."""

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.mcmc import run_chains, share_chain_args
from genjax_tpu.inference.requests import HMC
from genjax_tpu.models.logreg import logistic_regression, simulate_logreg_data

N, D, C = 1024, 16, 16


@pytest.fixture(scope="module")
def setup():
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    X, y, _ = simulate_logreg_data(jax.random.key(0), N, D)
    keys = jax.random.split(jax.random.key(1), C)
    trs, _ = jax.vmap(
        lambda k: logistic_regression.importance(k, ChoiceMap.kw(ys=y), (X,))
    )(keys)
    trs = share_chain_args(trs, (X,))
    Xs = jax.device_put(X, NamedSharding(mesh, P("data", None)))
    trs_sharded = dataclasses.replace(trs, args=(Xs,))
    return trs, trs_sharded


REQ = HMC(Selection.at["w"], jnp.asarray(0.02), L=3)


def _run(key, traces):
    return run_chains(key, traces, REQ, 2)[0].get_score()


class TestDataSharding:
    def test_sharded_matches_dense(self, setup):
        trs, trs_sharded = setup
        s_dense = jax.jit(_run)(jax.random.key(2), trs)
        s_shard = jax.jit(_run)(jax.random.key(2), trs_sharded)
        # identical math, different reduction grouping -> fp32 noise only
        assert jnp.max(jnp.abs(s_dense - s_shard)) < 1e-2

    def test_no_data_sized_collectives(self, setup):
        _, trs_sharded = setup
        hlo = (
            jax.jit(_run)
            .lower(jax.random.key(2), trs_sharded)
            .compile()
            .as_text()
        )
        lines = [
            l
            for l in hlo.splitlines()
            if "all-reduce(" in l or "all-gather(" in l
        ]
        assert lines, "expected cross-device reductions in the program"
        for l in lines:
            m = re.search(r"f32\[([\d,]*)\]", l)
            assert m, l
            dims = [int(s) for s in m.group(1).split(",") if s]
            size = int(np.prod(dims)) if dims else 1
            # chain-sized blocks only (C*D floats); the (N, D) data and
            # (N,) logits stay sharded — nothing within 4x of N
            assert size <= C * D, f"data-sized collective leaked: {l}"
