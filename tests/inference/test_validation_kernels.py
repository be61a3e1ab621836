"""SBC/Geweke applied to the framework's OWN samplers.

The validation harness (inference/validation.py) exists to certify
kernels; here it certifies the flagship gradient and slice moves — HMC,
NUTS, and elliptical slice — end to end through the GFI on a
two-latent model. A calibration bug anywhere in those request
implementations (leapfrog energy accounting, NUTS tree weights and
U-turn bookkeeping, slice bracket shrinkage) shows up as non-uniform
ranks or joint-moment z-score blowups."""

import zlib

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as gx
from genjax_tpu.inference.requests import HMC, NUTS, EllipticalSlice
from genjax_tpu.inference.validation import geweke, sbc


@gx.gen
def model2():
    mu = gx.normal(0.0, 1.0) @ "mu"
    z = gx.normal(0.0, 1.0) @ "z"
    _ = gx.normal(mu + 0.5 * z, 1.0) @ "y"


LATENTS = gx.Selection.at["mu"] | gx.Selection.at["z"]

KERNELS = {
    "hmc": (HMC(LATENTS, jnp.asarray(0.35), L=8, jitter=0.2), 2),
    "nuts": (NUTS(LATENTS, jnp.asarray(0.45), max_depth=4), 1),
    "elliptical": (EllipticalSlice(LATENTS), 2),
}


class TestKernelSBC:
    @pytest.mark.parametrize("name", sorted(KERNELS))
    def test_ranks_uniform(self, name):
        request, thin = KERNELS[name]
        res = sbc(
            jax.random.key(zlib.crc32(name.encode()) % 1000), model2, (), LATENTS,
            request, n_replicates=384, n_draws=19, thin=thin,
        )
        assert res.ranks.shape == (384, 2)
        stat, p = res.uniformity()
        # Two summaries (mu, z); demand both calibrated.
        assert float(jnp.min(p)) > 1e-4, (name, stat, p)


class TestKernelGeweke:
    def test_nuts_preserves_the_joint(self):
        res = geweke(
            jax.random.key(7), model2, (), LATENTS,
            NUTS(LATENTS, jnp.asarray(0.45), max_depth=4),
            n_forward=4096, n_steps=256, n_chains=8,
        )
        # summaries: (mu, z, y) and squares
        assert res.z_scores.shape == (6,)
        assert float(res.max_abs_z()) < 5.0, res.z_scores

    def test_hmc_preserves_the_joint(self):
        res = geweke(
            jax.random.key(8), model2, (), LATENTS,
            HMC(LATENTS, jnp.asarray(0.35), L=8, jitter=0.2),
            n_forward=4096, n_steps=256, n_chains=8, thin=2,
        )
        assert float(res.max_abs_z()) < 5.0, res.z_scores
