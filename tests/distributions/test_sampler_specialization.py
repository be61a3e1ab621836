"""Static sampler specialization: fast paths must match the generic
paths distributionally, and dispatch must be purely trace-time."""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g

KEYS = jax.random.split(jax.random.key(0), 30000)


def ks_distance(a, b):
    """Two-sample Kolmogorov-Smirnov statistic."""
    grid = jnp.sort(jnp.concatenate([a, b]))
    cdf_a = jnp.searchsorted(jnp.sort(a), grid, side="right") / a.shape[0]
    cdf_b = jnp.searchsorted(jnp.sort(b), grid, side="right") / b.shape[0]
    return jnp.max(jnp.abs(cdf_a - cdf_b))


class TestFastPathsMatchGeneric:
    @pytest.mark.parametrize(
        "a,b",
        [(2.0, 2.0), (1.0, 3.0), (0.5, 1.5), (2.5, 0.5)],
        ids=["int-int", "int-int2", "half-half", "half-half2"],
    )
    def test_beta(self, a, b):
        fast = jax.vmap(lambda k: g.beta.sample(k, a, b))(KEYS)
        ref = jax.vmap(lambda k: jax.random.beta(k, a, b))(KEYS)
        assert ks_distance(fast, ref) < 0.015

    @pytest.mark.parametrize("conc", [1.0, 3.0, 2.5, 0.5])
    def test_gamma(self, conc):
        fast = jax.vmap(lambda k: g.gamma.sample(k, conc, 1.0))(KEYS)
        ref = jax.vmap(lambda k: jax.random.gamma(k, conc))(KEYS)
        assert ks_distance(fast, ref) < 0.015

    @pytest.mark.parametrize("df", [1.0, 4.0, 5.0])
    def test_chi2(self, df):
        fast = jax.vmap(lambda k: g.chi2.sample(k, df))(KEYS)
        ref = jax.vmap(lambda k: jax.random.chisquare(k, df))(KEYS)
        assert ks_distance(fast, ref) < 0.015

    def test_student_t(self):
        fast = jax.vmap(lambda k: g.student_t.sample(k, 5.0, 0.0, 1.0))(KEYS)
        ref = jax.vmap(lambda k: jax.random.t(k, 5.0))(KEYS)
        assert ks_distance(fast, ref) < 0.015

    def test_binomial(self):
        fast = jax.vmap(lambda k: g.binomial.sample(k, 10.0, probs=0.37))(KEYS)
        ref = jax.vmap(lambda k: jax.random.binomial(k, 10.0, 0.37))(KEYS)
        # discrete: compare pmfs
        for v in range(11):
            pa = jnp.mean(fast == v)
            pb = jnp.mean(ref == v)
            assert jnp.abs(pa - pb) < 0.012


class TestDispatchIsTraceTime:
    def test_traced_params_use_generic_path(self):
        """Non-concrete parameters must not break (generic sampler)."""

        @jax.jit
        def draw(key, a, b):
            return g.beta.sample(key, a, b)

        v = draw(jax.random.key(0), 2.0, 2.0)
        assert 0.0 <= float(v) <= 1.0

    def test_specialization_under_jit_closure(self):
        """Literal hyperparameters stay concrete inside jit closures, so
        the fast path fires (same jaxpr has no gamma rejection loop)."""

        @jax.jit
        def draw(key):
            return g.beta.sample(key, 2.0, 2.0)

        text = jax.make_jaxpr(lambda k: g.beta.sample(k, 2.0, 2.0))(
            jax.random.key(0)
        ).pretty_print()
        assert "while" not in text  # no rejection loop in the fast path
        v = draw(jax.random.key(0))
        assert 0.0 <= float(v) <= 1.0

    def test_fast_path_in_gen_model(self):
        @g.gen
        def model():
            p = g.beta(2.0, 2.0) @ "p"
            return p

        tr = jax.jit(model.simulate)(jax.random.key(0), ())
        p = tr.get_choices()["p"]
        assert 0.0 <= float(p) <= 1.0
        # density still the exact beta density
        assert jnp.allclose(
            tr.get_score(), g.beta.logpdf(p, 2.0, 2.0), atol=1e-5
        )


class TestSpecializationSurvivesCanonicalization:
    """Model args canonicalized by `lang.static._canon_args` must stay
    trace-time concrete: `jnp.asarray` would stage literals into tracers
    and silently fall back to the rejection sampler (a 24x regression on
    the SIR benchmark, caught on hardware in r3)."""

    def test_canon_scalar_is_concrete_under_jit(self):
        from genjax_tpu.distributions.library import _static_small_int
        from genjax_tpu.lang.static import _canon_scalar

        captured = {}

        @jax.jit
        def probe(key):
            captured["ssi"] = _static_small_int(_canon_scalar(2.0), 8)
            return jax.random.uniform(key)

        probe(jax.random.key(0))
        assert captured["ssi"] == 2

    def test_model_literal_args_specialize_through_gfi(self):
        @g.gen
        def bb(a, b):
            p = g.beta(a, b) @ "p"
            return p

        text = jax.make_jaxpr(
            lambda k: bb.simulate(k, (2.0, 2.0)).get_score()
        )(jax.random.key(0)).pretty_print()
        # order-statistic fast path: a sort, no gamma rejection loop
        assert "sort" in text and "while" not in text

    def test_eager_and_jit_trace_structures_match(self):
        import jax.tree_util as jtu

        @g.gen
        def bb(a, b):
            p = g.beta(a, b) @ "p"
            return p

        tr = bb.simulate(jax.random.key(0), (2.0, 2.0))
        jtr = jax.jit(bb.simulate)(jax.random.key(0), (2.0, 2.0))
        assert jtu.tree_structure(tr) == jtu.tree_structure(jtr)
