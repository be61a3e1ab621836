"""Convergence diagnostics: split R-hat and autocorrelation ESS against
analytically known cases (i.i.d. draws, AR(1) chains with closed-form
integrated autocorrelation time, disjoint stuck chains)."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.inference.diagnostics import effective_sample_size, split_rhat


def ar1_chains(seed, m, n, rho):
    rng = np.random.default_rng(seed)
    x = np.zeros((m, n))
    e = rng.normal(size=(m, n)) * np.sqrt(1 - rho**2)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + e[:, t]
    return jnp.asarray(x)


class TestSplitRhat:
    def test_iid_chains_near_one(self):
        x = jax.random.normal(jax.random.key(0), (8, 500))
        assert 0.98 < float(split_rhat(x)) < 1.02

    def test_disjoint_chains_flagged(self):
        x = jax.random.normal(jax.random.key(1), (8, 500))
        stuck = x + 10.0 * jnp.arange(8.0)[:, None]
        assert float(split_rhat(stuck)) > 2.0

    def test_within_chain_drift_flagged(self):
        # A trend inside each chain (first half != second half) must be
        # caught by the SPLIT form even though full-chain means agree.
        n = 500
        trend = jnp.concatenate([jnp.zeros(n // 2), 5.0 * jnp.ones(n // 2)])
        x = jax.random.normal(jax.random.key(2), (8, n)) + trend[None, :]
        assert float(split_rhat(x)) > 1.5

    def test_pytree_and_trailing_dims(self):
        tree = {"w": jax.random.normal(jax.random.key(3), (4, 300, 3))}
        r = split_rhat(tree)
        assert r["w"].shape == (3,)
        assert bool(jnp.all(r["w"] < 1.05))


class TestEffectiveSampleSize:
    def test_iid_near_nominal(self):
        x = jax.random.normal(jax.random.key(4), (8, 500))
        ess = float(effective_sample_size(x))
        assert 0.7 * 4000 < ess < 1.4 * 4000

    def test_ar1_matches_closed_form(self):
        # AR(1): tau = (1+rho)/(1-rho), ESS/N = (1-rho)/(1+rho).
        rho = 0.9
        x = ar1_chains(0, 8, 4000, rho)
        ratio = float(effective_sample_size(x)) / (8 * 4000)
        expect = (1 - rho) / (1 + rho)  # 0.0526
        assert abs(ratio - expect) < 0.02

    def test_more_correlation_means_less_ess(self):
        e1 = float(effective_sample_size(ar1_chains(1, 8, 2000, 0.5)))
        e2 = float(effective_sample_size(ar1_chains(1, 8, 2000, 0.95)))
        assert e2 < e1 / 3

    def test_pytree_and_trailing_dims(self):
        tree = {"w": jax.random.normal(jax.random.key(5), (4, 300, 3))}
        e = effective_sample_size(tree)
        assert e["w"].shape == (3,)
        assert bool(jnp.all(e["w"] > 500))

    def test_jit_compatible(self):
        x = jax.random.normal(jax.random.key(6), (8, 500))
        a = float(jax.jit(effective_sample_size)(x))
        b = float(effective_sample_size(x))
        assert abs(a - b) < 1e-3 * max(abs(b), 1.0)
