"""Invariance laws of the convergence diagnostics (hypothesis-driven):
split R-hat and ESS are invariant under affine maps of the samples and
under permutations of the chain order; R-hat responds monotonically to
injected between-chain separation."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from genjax_tpu.inference.diagnostics import effective_sample_size, split_rhat

scales = st.floats(min_value=0.01, max_value=100.0, allow_nan=False)
shifts = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False)
seeds = st.integers(min_value=0, max_value=2**16)


def chains(seed, m=6, n=200):
    return jax.random.normal(jax.random.key(seed), (m, n))


class TestInvariances:
    @settings(max_examples=15, deadline=None)
    @given(scales, shifts, seeds)
    def test_affine_invariance(self, a, b, seed):
        x = chains(seed)
        y = a * x + b
        assert jnp.allclose(split_rhat(x), split_rhat(y), rtol=1e-4)
        assert jnp.allclose(
            effective_sample_size(x), effective_sample_size(y), rtol=1e-3
        )

    @settings(max_examples=10, deadline=None)
    @given(seeds, seeds)
    def test_chain_permutation_invariance(self, seed, pseed):
        x = chains(seed)
        perm = jax.random.permutation(jax.random.key(pseed), x.shape[0])
        y = x[perm]
        assert jnp.allclose(split_rhat(x), split_rhat(y), rtol=1e-5)
        assert jnp.allclose(
            effective_sample_size(x), effective_sample_size(y), rtol=1e-4
        )

    @settings(max_examples=10, deadline=None)
    @given(seeds, st.floats(min_value=0.5, max_value=5.0))
    def test_rhat_monotone_in_separation(self, seed, sep):
        """Injecting between-chain offsets of growing size must raise
        R-hat monotonically relative to the unseparated batch."""
        x = chains(seed)
        offs = jnp.linspace(-1.0, 1.0, x.shape[0])[:, None]
        r0 = float(split_rhat(x))
        r1 = float(split_rhat(x + sep * offs))
        r2 = float(split_rhat(x + 2.0 * sep * offs))
        assert r0 < r1 < r2

    def test_ess_collapses_for_separated_chains(self):
        """Chains stuck in disjoint regions carry (multi-chain) ESS far
        below nominal: the between-chain term inflates var_plus, the
        combined autocorrelation stays near 1, and tau explodes."""
        x = chains(0)
        mixed = float(effective_sample_size(x))
        stuck = float(
            effective_sample_size(x + 10.0 * jnp.arange(6.0)[:, None])
        )
        assert stuck < 0.05 * mixed, (stuck, mixed)
