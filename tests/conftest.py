"""Test configuration.

Forces the CPU platform with 8 virtual devices so multi-chip sharding code
paths are exercised without TPU hardware (the standard JAX pattern for
testing `shard_map`/`pjit` code).

Note: this image's `sitecustomize` imports jax at interpreter start and
pins `JAX_PLATFORMS=axon` (a tunneled remote TPU). Dispatching thousands of
tiny test ops through that tunnel is pathologically slow, so we override
the platform via `jax.config` — which works as long as no backend has been
initialized yet (true at conftest import time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, not the tunneled TPU"
)


# ---------------------------------------------------------------------------
# Smoke tier: `pytest -m smoke` runs a <5-minute cross-subsystem proof
# subset (every module's cheapest exactness tests). Membership lives in
# tests/smoke_set.txt as node-id prefixes, one per line; keep it fast —
# the full suite is the correctness gate, smoke is the iteration loop.
# ---------------------------------------------------------------------------
import pathlib

import pytest

_SMOKE_FILE = pathlib.Path(__file__).parent / "smoke_set.txt"


def pytest_collection_modifyitems(config, items):
    if not _SMOKE_FILE.exists():
        return
    prefixes = [
        ln.strip()
        for ln in _SMOKE_FILE.read_text().splitlines()
        if ln.strip() and not ln.startswith("#")
    ]
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if any(nodeid.startswith(p) for p in prefixes):
            item.add_marker(pytest.mark.smoke)


# ---------------------------------------------------------------------------
# Guard against kernel mmap-budget exhaustion: XLA:CPU maps ~3 anonymous
# regions per compiled executable and the full suite compiles tens of
# thousands, so one pytest process crosses the `vm.max_map_count` default
# (65530) around the 1000-test mark — at which point LLVM's code-buffer
# mmap fails and the process dies with a SIGSEGV deep inside
# `backend_compile_and_load` (reproduced: the map count read 65403 on the
# sample taken seconds before the crash). `jax.clear_caches()` releases
# the executables (verified: 3850 maps -> 475), so drop the caches
# whenever the map count crosses a safety threshold. Costs a handful of
# recompiles per suite run; tests never share compilations across
# modules anyway.
# ---------------------------------------------------------------------------
import gc

_MAPS_FILE = pathlib.Path("/proc/self/maps")
_MAPS_LIMIT = 40_000


def _map_count() -> int:
    try:
        with _MAPS_FILE.open("rb") as fh:
            return sum(1 for _ in fh)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _cap_jit_mappings():
    yield
    if _map_count() > _MAPS_LIMIT:
        jax.clear_caches()
        gc.collect()
