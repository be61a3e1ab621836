"""Spherical-distribution normalization via surface quadrature (validates
the hand-rolled `log_bessel_iv` across small and large orders/arguments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g


def sphere_integral(logpdf_fn, n=400):
    th = jnp.linspace(1e-4, np.pi - 1e-4, n)
    ph = jnp.linspace(0, 2 * np.pi, n)
    TH, PH = jnp.meshgrid(th, ph, indexing="ij")
    xs = jnp.stack(
        [jnp.sin(TH) * jnp.cos(PH), jnp.sin(TH) * jnp.sin(PH), jnp.cos(TH)], -1
    )
    dens = jnp.exp(jax.vmap(jax.vmap(logpdf_fn))(xs))
    return jnp.trapezoid(jnp.trapezoid(dens * jnp.sin(TH), ph, axis=1), th)


class TestVonMisesFisher:
    @pytest.mark.parametrize("kappa", [0.1, 1.0, 5.0, 20.0, 100.0])
    def test_normalizes_on_s2(self, kappa):
        mu = jnp.array([0.0, 0.0, 1.0])
        z = sphere_integral(lambda v: g.von_mises_fisher.logpdf(v, mu, kappa))
        assert jnp.allclose(z, 1.0, atol=5e-3), float(z)


class TestPowerSphericalS2:
    @pytest.mark.parametrize("kappa", [0.5, 4.0, 30.0])
    def test_normalizes_on_s2(self, kappa):
        mu = jnp.array([0.0, 1.0, 0.0])
        z = sphere_integral(lambda v: g.power_spherical.logpdf(v, mu, kappa))
        assert jnp.allclose(z, 1.0, atol=5e-3), float(z)


class TestVonMisesCircle:
    @pytest.mark.parametrize("kappa", [0.1, 2.0, 50.0])
    def test_normalizes(self, kappa):
        th = jnp.linspace(-np.pi, np.pi, 40001)
        dens = jnp.exp(jax.vmap(lambda t: g.von_mises.logpdf(t, 0.3, kappa))(th))
        assert jnp.allclose(jnp.trapezoid(dens, th), 1.0, atol=5e-3)
