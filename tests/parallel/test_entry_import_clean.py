"""__graft_entry__ must import without initializing any JAX backend.

Round-4 regression: `EXACT_LML = float(... jnp.log(...))` at module scope
performed device work at import time, initializing the sitecustomize-pinned
axon TPU backend before `dryrun_multichip` could switch to the virtual CPU
mesh — MULTICHIP_r04.json went `ok: false`. The in-suite dryrun test did
not catch it because tests/conftest.py forces the CPU backend *before* the
import, which is not the driver's environment.

These tests run in clean subprocesses with conftest's env overrides
stripped (sitecustomize intact — exactly what the driver sees) and assert:
  1. importing the module leaves `jax._src.xla_bridge._backends` empty;
  2. `dryrun_multichip(8)` succeeds with ONLY
     `XLA_FLAGS=--xla_force_host_platform_device_count=8` set.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))


def _driver_env(**overrides):
    """The driver's environment: conftest's JAX overrides removed,
    sitecustomize (PYTHONPATH) left intact."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(overrides)
    return env


def test_import_initializes_no_backend():
    # The axon platform plugin is registered by sitecustomize, but no
    # backend may be *initialized* by the import — backend init under the
    # driver env means locking the 1-chip tunneled TPU (or dying outright
    # during a tunnel outage / libtpu mismatch, as in round 4).
    code = (
        "import __graft_entry__\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, (\n"
        "    'importing __graft_entry__ initialized backend(s): '\n"
        "    + repr(list(xb._backends))\n"
        ")\n"
        "print('import clean')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "import clean" in proc.stdout


@pytest.mark.slow
def test_dryrun_runs_in_driver_environment():
    # Exactly the driver's invocation: fresh interpreter, sitecustomize
    # intact, only the virtual-device flag set — no JAX_PLATFORMS=cpu, no
    # conftest. dryrun_multichip must do the platform switch itself.
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_driver_env(
            XLA_FLAGS="--xla_force_host_platform_device_count=8"
        ),
        capture_output=True,
        text=True,
        timeout=590,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip(8)" in proc.stdout
