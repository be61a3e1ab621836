"""docs/API.md must track the live public surface: every name a module
declares in `__all__` appears on the page, and every inference submodule
listed in `inference.__all__` has a section."""

import importlib
import pathlib

import genjax_tpu.inference as inference

API = (pathlib.Path(__file__).parents[2] / "docs" / "API.md").read_text()


def test_inference_submodules_listed():
    for name in inference.__all__:
        assert name in API, f"inference.{name} missing from docs/API.md"


def test_module_alls_covered():
    mods = [
        "genjax_tpu.inference.adaptation",
        "genjax_tpu.inference.chees",
        "genjax_tpu.inference.diagnostics",
        "genjax_tpu.inference.kalman",
        "genjax_tpu.inference.map_laplace",
        "genjax_tpu.inference.particle_gibbs",
        "genjax_tpu.inference.pmmh",
        "genjax_tpu.inference.psis",
        "genjax_tpu.inference.rbpf",
        "genjax_tpu.inference.sample",
        "genjax_tpu.inference.smoothing",
        "genjax_tpu.inference.requests",
        "genjax_tpu.inference.svgd",
        "genjax_tpu.inference.smc2",
        "genjax_tpu.inference.involutive",
        "genjax_tpu.inference.nested",
        "genjax_tpu.inference.parallel_tempering",
        "genjax_tpu.inference.rjmcmc",
        "genjax_tpu.inference.abc",
        "genjax_tpu.inference.validation",
    ]
    missing = []
    for modname in mods:
        mod = importlib.import_module(modname)
        for name in getattr(mod, "__all__", ()):
            if name not in API:
                missing.append(f"{modname}.{name}")
    assert not missing, f"missing from docs/API.md: {missing}"
