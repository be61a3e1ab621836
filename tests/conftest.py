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
