"""Compiled-HLO pins for the island-SMC hybrid-mesh claim (PARITY P6).

The Vergé island-particle-filter decomposition promises that the island
(DCN) axis of a hybrid mesh carries ONLY scalar diagnostics — particle
state and weight vectors stay inside each island's ICI block. These
tests compile the island-SMC programs on a (2 islands x 4 particles)
mesh of the 8 virtual devices and assert, op by op, that

(i)   every collective whose replica group crosses an island boundary
      moves at most a per-island-scalar payload;
(ii)  weight-sized collectives (LML/ESS psums, resample exchange) keep
      their replica groups INSIDE one island block;
(iii) no collective anywhere moves the K x D particle payload.

A regression that routes particle rows (or whole weight vectors) over
the DCN axis changes the replica groups or payload sizes and fails
here. Mirrors tests/parallel/test_hlo_collectives.py, which pins the
flat single-axis ShardedSMC programs.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Regenerate, Selection, Target
from genjax_tpu.parallel import hybrid_mesh, island_smc

N_ISLANDS, N_PART_DEV = 2, 4
K = 512  # particles per island
D = 64  # per-particle payload dwarfs the weight vector

# Per-device scalar diagnostics may legitimately cross DCN (per-island
# LML/ESS, the maybe_resample predicate); anything bigger is state.
SCALAR_BUDGET = 16


@g.gen
def wide_model():
    w = g.mv_normal_diag(jnp.zeros(D), jnp.ones(D)) @ "w"
    _ = g.normal(jnp.sum(w), 1.0) @ "y"


@pytest.fixture(scope="module")
def mesh():
    return hybrid_mesh(island_devices=N_ISLANDS, particle_devices=N_PART_DEV)


@pytest.fixture(scope="module")
def island_blocks(mesh):
    """device id -> island index, from the mesh's own device layout."""
    blocks = {}
    devs = np.asarray(mesh.devices)
    for i in range(devs.shape[0]):
        for dev in devs[i].ravel():
            blocks[dev.id] = i
    return blocks


@pytest.fixture(scope="module")
def smc(mesh):
    return island_smc(
        n_islands=N_ISLANDS, n_particles=K, mesh=mesh, ess_threshold=2.0
    )


@pytest.fixture(scope="module")
def collection(smc):
    tgt = Target(wide_model, (), ChoiceMap.kw(y=1.0))
    return jax.jit(smc.init)(jax.random.key(0), tgt)


def _decode_groups(attr: str, n_devices: int) -> list[list[int]]:
    """Decode an HLO replica_groups attribute — either the explicit
    `{{0,1},{2,3}}` form or the iota `[g,s]<=[dims]T(perm)` form."""
    attr = attr.strip()
    if attr.startswith("{"):
        return [
            [int(x) for x in grp.split(",") if x.strip() != ""]
            for grp in re.findall(r"\{([\d,\s]*)\}", attr)
            if grp.strip() != ""
        ]
    m = re.match(
        r"\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?", attr
    )
    assert m, f"unrecognized replica_groups format: {attr!r}"
    n_groups, group_size = int(m.group(1)), int(m.group(2))
    dims = [int(d) for d in m.group(3).split(",")]
    ids = np.arange(int(np.prod(dims))).reshape(dims)
    if m.group(4):
        perm = [int(p) for p in m.group(4).split(",")]
        ids = ids.transpose(perm)
    return ids.reshape(n_groups, group_size).tolist()


def collective_ops(hlo_text: str, n_devices: int = 8):
    """Yield (kind, result_elements, groups) for every collective.

    `groups` is a list of device-id groups (for permutes, each
    source-target pair becomes a 2-group)."""
    out = []
    for m in re.finditer(
        r"=\s*\(?([a-z0-9]+)\[([\d,]*)\][^\n]*?\b"
        r"(all-gather|all-reduce|reduce-scatter|all-to-all)"
        r"[^\n]*?replica_groups=((?:\{\{[^\n]*?\}\})|(?:\[[^\n ]*))",
        hlo_text,
    ):
        dims = m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append((m.group(3), n, _decode_groups(m.group(4), n_devices)))
    for m in re.finditer(
        r"=\s*\(?([a-z0-9]+)\[([\d,]*)\][^\n]*?\bcollective-permute"
        r"[^\n]*?source_target_pairs=\{([^}]*)\}",
        hlo_text,
    ):
        dims = m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        pairs = [
            [int(a), int(b)]
            for a, b in re.findall(r"\{(\d+),(\d+)\}", m.group(3))
        ]
        out.append(("collective-permute", n, pairs))
    return out


def _crosses_island(group, island_blocks) -> bool:
    return len({island_blocks[d] for d in group}) > 1


def _assert_dcn_carries_scalars_only(hlo, island_blocks, what):
    """The test's core invariant: collectives crossing the island (DCN)
    boundary may carry per-island scalars only. Payload-size budgets for
    the island-LOCAL (ICI) collectives — weight-sized gathers, cold
    far-hop fallback branches — are test_hlo_collectives.py's job."""
    ops = collective_ops(hlo)
    for kind, n_elems, groups in ops:
        crossing = [grp for grp in groups if _crosses_island(grp, island_blocks)]
        if crossing:
            assert n_elems <= SCALAR_BUDGET, (
                f"{what}: {kind} of {n_elems} elements crosses the island "
                f"(DCN) axis (groups {crossing}) — only per-island scalar "
                f"diagnostics may ride DCN."
            )
    return ops


class TestIslandCollectives:
    def test_init_has_no_cross_island_traffic(self, smc, collection, island_blocks):
        tgt = Target(wide_model, (), ChoiceMap.kw(y=1.0))
        hlo = (
            jax.jit(smc.init).lower(jax.random.key(0), tgt).compile().as_text()
        )
        _assert_dcn_carries_scalars_only(hlo, island_blocks, "init")

    def test_per_island_lml_reduces_inside_islands(
        self, smc, collection, island_blocks
    ):
        hlo = (
            jax.jit(smc.per_chain_lml)
            .lower(collection)
            .compile()
            .as_text()
        )
        ops = _assert_dcn_carries_scalars_only(
            hlo, island_blocks, "per_chain_lml"
        )
        # The weight reduction itself must exist and stay island-local.
        local_reduces = [
            (k, n, grp)
            for k, n, grps in ops
            for grp in grps
            if k in ("all-reduce", "reduce-scatter")
            and not _crosses_island(grp, island_blocks)
        ]
        assert local_reduces, (
            "expected island-local weight reductions in per_chain_lml"
        )

    def test_resample_exchange_stays_inside_islands(
        self, smc, collection, island_blocks
    ):
        hlo = (
            jax.jit(smc.maybe_resample)
            .lower(jax.random.key(1), collection)
            .compile()
            .as_text()
        )
        ops = _assert_dcn_carries_scalars_only(
            hlo, island_blocks, "maybe_resample"
        )
        # Any non-scalar exchange traffic (ancestor rows, weight
        # gathers, neighbor permutes) must be island-local.
        for kind, n_elems, groups in ops:
            if n_elems > SCALAR_BUDGET:
                for grp in groups:
                    assert not _crosses_island(grp, island_blocks), (
                        f"resample {kind} of {n_elems} elements crossed "
                        f"islands: {grp}"
                    )

    def test_rejuvenation_no_cross_island_traffic(
        self, smc, collection, island_blocks
    ):
        req = Regenerate(Selection.at["w"])
        hlo = (
            jax.jit(smc.rejuvenate)
            .lower(jax.random.key(2), collection, req)
            .compile()
            .as_text()
        )
        _assert_dcn_carries_scalars_only(hlo, island_blocks, "rejuvenate")

    def test_decoder_handles_iota_groups(self):
        # Unit test of the replica-group decoder itself (the iota format
        # appears whenever XLA canonicalizes groups).
        assert _decode_groups("{{0,1,2,3},{4,5,6,7}}", 8) == [
            [0, 1, 2, 3],
            [4, 5, 6, 7],
        ]
        assert _decode_groups("[2,4]<=[8]", 8) == [
            [0, 1, 2, 3],
            [4, 5, 6, 7],
        ]
        assert _decode_groups("[4,2]<=[2,4]T(1,0)", 8) == [
            [0, 4],
            [1, 5],
            [2, 6],
            [3, 7],
        ]
