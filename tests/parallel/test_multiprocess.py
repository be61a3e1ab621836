"""2-process multihost integration test (closes SURVEY §2.2 P6).

Launches two OS processes, each with 4 virtual CPU devices, joined into
one 8-device JAX cluster via `jax.distributed.initialize` on a localhost
coordinator. The worker (`_multiproc_worker.py`) executes the
multi-process branches of `parallel/multihost.py` that single-process
tests cannot reach — `create_hybrid_device_mesh` granule placement,
cross-DCN island SMC, `make_array_from_process_local_data` — and
certifies the pooled LML against the conjugate oracle.

The parent additionally reruns the same island SMC single-process on its
own 8-device virtual mesh with the same PRNG key and asserts the
per-island LMLs agree to float tolerance: the multi-process layout must
not change the numbers (PRNG streams are keyed by global particle id,
not by process).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(os.path.dirname(HERE))
WORKER = os.path.join(HERE, "_multiproc_worker.py")
N_PROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_island_smc_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker switches platform itself
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # The worker must import genjax_tpu without relying on an editable
    # install being present in the image.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(N_PROC), str(port)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(N_PROC)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc})\nstdout:\n{out}\nstderr:\n{err}"

    result_lines = [
        ln
        for rc, out, _ in outs
        for ln in out.splitlines()
        if ln.startswith("RESULT ")
    ]
    assert len(result_lines) == 1, outs
    result = json.loads(result_lines[0][len("RESULT "):])

    # Single-process reference: identical logical run (same key, same
    # (islands=2, particles=2048) layout) on this process's 8-device
    # virtual mesh. The PRNG is keyed by global particle id, so the
    # process topology must not move a single bit of the estimate beyond
    # float reduction order.
    import jax

    import genjax_tpu as g
    from genjax_tpu import ChoiceMap, Target
    from genjax_tpu.parallel.multihost import hybrid_mesh, island_smc, pooled_lml

    @g.gen
    def model():
        x = g.normal(0.0, 1.0) @ "x"
        y = g.normal(x, 1.0) @ "y"
        return y

    target = Target(model, (), ChoiceMap.kw(y=1.0))
    mesh = hybrid_mesh(island_devices=2, particle_devices=4)
    islands = island_smc(n_islands=2, n_particles=2048, mesh=mesh)
    col = jax.jit(islands.init)(jax.random.key(0), target)
    lmls = np.asarray(jax.jit(islands.per_chain_lml)(col))
    plml = float(np.asarray(jax.jit(pooled_lml)(jax.numpy.asarray(lmls))))

    np.testing.assert_allclose(
        np.asarray(result["per_island"]),
        lmls,
        rtol=0,
        atol=1e-5,
        err_msg="2-process island LMLs diverged from the single-process "
        "same-PRNG run",
    )
    assert abs(result["pooled_lml"] - plml) <= 1e-5
