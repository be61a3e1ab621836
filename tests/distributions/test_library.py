"""Native distribution library validation.

Three families of checks, replacing the trust the reference delegates to
TFP:
1. densities normalize (quadrature for continuous, summation for discrete);
2. sample moments match analytic moments;
3. samplers and densities agree (empirical CDF / histogram vs density).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g

KEY = jax.random.key(0)
N = 20_000


def sample_many(dist, n, *args, **kwargs):
    keys = jax.random.split(KEY, n)
    return jax.vmap(lambda k: dist.sample(k, *args, **kwargs))(keys)


def quad_normalization(dist, lo, hi, *args, n_grid=20001):
    xs = jnp.linspace(lo, hi, n_grid)
    ps = jnp.exp(jax.vmap(lambda x: dist.logpdf(x, *args))(xs))
    return jnp.trapezoid(ps, xs)


def sum_normalization(dist, support, *args):
    ps = jnp.exp(jax.vmap(lambda k: dist.logpdf(k, *args))(support))
    return jnp.sum(ps)


CONTINUOUS_CASES = [
    # (dist, args, integration range, mean, var)
    (g.normal, (0.5, 2.0), (-20, 21), 0.5, 4.0),
    (g.uniform, (1.0, 3.0), (0.99, 3.01), 2.0, 4.0 / 12),
    (g.beta, (2.0, 3.0), (1e-6, 1 - 1e-6), 0.4, 0.04),
    (g.cauchy, (0.0, 1.0), (-2000, 2000), None, None),
    (g.half_cauchy, (0.0, 1.0), (0, 4000), None, None),
    (g.half_normal, (2.0,), (0, 25), 2.0 * np.sqrt(2 / np.pi), 4.0 * (1 - 2 / np.pi)),
    (g.student_t, (5.0, 1.0, 2.0), (-60, 62), 1.0, 4.0 * 5 / 3),
    (g.half_student_t, (5.0, 0.0, 1.0), (0, 80), None, None),
    (g.exponential, (2.0,), (0, 20), 0.5, 0.25),
    (g.gamma, (3.0, 2.0), (0, 30), 1.5, 0.75),
    (g.inverse_gamma, (4.0, 3.0), (1e-4, 50), 1.0, 0.5),
    (g.exp_gamma, (2.0, 1.0), (-15, 10), None, None),
    (g.exp_half_cauchy, (5.0,), (-35, 40), None, None),
    (g.exp_inverse_gamma, (2.0, 1.0), (-10, 15), None, None),
    (g.chi2, (4.0,), (0, 60), 4.0, 8.0),
    (g.chi, (3.0,), (0, 15), np.sqrt(2) / 0.88622693, None),  # sqrt2*gamma(2)/gamma(1.5)
    (g.laplace, (1.0, 0.5), (-15, 17), 1.0, 0.5),
    (g.gumbel, (0.0, 1.0), (-10, 30), 0.5772157, np.pi**2 / 6),
    (g.log_normal, (0.0, 0.5), (1e-5, 30), np.exp(0.125), None),
    (g.logit_normal, (0.0, 1.0), (1e-6, 1 - 1e-6), 0.5, None),
    (g.truncated_normal, (0.0, 1.0, -1.0, 2.0), (-1.0, 2.0), None, None),
    (g.truncated_cauchy, (0.0, 1.0, -2.0, 2.0), (-2.0, 2.0), 0.0, None),
    (g.weibull, (2.0, 1.5), (0, 10), 1.5 * 0.8862269, None),  # scale*gamma(1.5)
    (g.kumaraswamy, (2.0, 3.0), (1e-6, 1 - 1e-6), None, None),
    (g.double_sided_maxwell, (0.0, 1.0), (-15, 15), 0.0, 3.0),
    (g.moyal, (0.0, 1.0), (-8, 60), None, None),
    (g.inverse_gaussian, (1.0, 2.0), (1e-4, 40), 1.0, 0.5),
    (g.lambert_w_normal, (0.0, 1.0, 0.1), (-30, 30), 0.0, None),
    (g.von_mises, (0.5, 2.0), (-np.pi, np.pi), None, None),
]


class TestContinuousNormalization:
    @pytest.mark.parametrize(
        "dist,args,rng", [(d, a, r) for d, a, r, _, _ in CONTINUOUS_CASES],
        ids=[type(d).__name__ for d, _, _, _, _ in CONTINUOUS_CASES],
    )
    def test_density_normalizes(self, dist, args, rng):
        z = quad_normalization(dist, rng[0], rng[1], *args)
        assert jnp.allclose(z, 1.0, atol=2e-2), f"integral = {z}"


class TestContinuousMoments:
    @pytest.mark.parametrize(
        "dist,args,mean,var",
        [(d, a, m, v) for d, a, _, m, v in CONTINUOUS_CASES if m is not None],
        ids=[
            type(d).__name__ for d, _, _, m, _ in CONTINUOUS_CASES if m is not None
        ],
    )
    def test_sample_mean_and_var(self, dist, args, mean, var):
        xs = sample_many(dist, N, *args)
        se = jnp.std(xs) / jnp.sqrt(float(N)) + 1e-3
        assert jnp.abs(jnp.mean(xs) - mean) < 6 * se, (
            f"mean {jnp.mean(xs)} vs {mean}"
        )
        if var is not None:
            assert jnp.allclose(jnp.var(xs), var, rtol=0.15), (
                f"var {jnp.var(xs)} vs {var}"
            )


DISCRETE_CASES = [
    # (dist, kwargs/args as tuple, support, mean)
    (g.poisson, (3.5,), jnp.arange(60), 3.5),
    (g.geometric, ((), {"probs": 0.3}), jnp.arange(80), 0.7 / 0.3),
    (g.binomial, ((10.0,), {"probs": 0.4}), jnp.arange(11.0), 4.0),
    (g.beta_binomial, (10.0, 2.0, 3.0), jnp.arange(11.0), 4.0),
    (g.negative_binomial, ((5.0,), {"probs": 0.4}), jnp.arange(80.0), 5.0 * 0.4 / 0.6),
    (g.zipf, (2.5,), jnp.arange(1, 20000), None),
    (g.skellam, (2.0, 1.0), jnp.arange(-40, 60), 1.0),
]


def _call_args(spec):
    if len(spec) == 2 and isinstance(spec[1], dict):
        return spec[0], spec[1]
    return spec, {}


class TestDiscrete:
    @pytest.mark.parametrize(
        "dist,spec,support,mean", DISCRETE_CASES,
        ids=[type(d).__name__ for d, _, _, _ in DISCRETE_CASES],
    )
    def test_pmf_normalizes(self, dist, spec, support, mean):
        args, kwargs = _call_args(spec)
        ps = jnp.exp(
            jax.vmap(lambda k: dist.logpdf(k, *args, **kwargs))(support)
        )
        assert jnp.allclose(jnp.sum(ps), 1.0, atol=1e-2), jnp.sum(ps)

    @pytest.mark.parametrize(
        "dist,spec,support,mean",
        [c for c in DISCRETE_CASES if c[3] is not None],
        ids=[type(c[0]).__name__ for c in DISCRETE_CASES if c[3] is not None],
    )
    def test_sample_mean(self, dist, spec, support, mean):
        args, kwargs = _call_args(spec)
        xs = sample_many(dist, N, *args, **kwargs).astype(jnp.float32)
        se = jnp.std(xs) / jnp.sqrt(float(N)) + 1e-3
        assert jnp.abs(jnp.mean(xs) - mean) < 6 * se

    def test_bernoulli_flip_categorical(self):
        # bernoulli: int samples, logit parameterization
        xs = sample_many(g.bernoulli, N, logits=0.8)
        p = jax.nn.sigmoid(0.8)
        assert xs.dtype == jnp.int32
        assert jnp.abs(jnp.mean(xs.astype(float)) - p) < 0.02
        assert jnp.allclose(
            g.bernoulli.logpdf(1, logits=0.8), jnp.log(p), atol=1e-6
        )
        # flip: bool samples, prob parameterization
        fs = sample_many(g.flip, N, 0.3)
        assert fs.dtype == jnp.bool_
        assert jnp.abs(jnp.mean(fs.astype(float)) - 0.3) < 0.02
        # categorical
        logits = jnp.log(jnp.array([0.2, 0.3, 0.5]))
        cs = sample_many(g.categorical, N, logits=logits)
        freq = jnp.mean((cs[:, None] == jnp.arange(3)).astype(float), axis=0)
        assert jnp.allclose(freq, jnp.array([0.2, 0.3, 0.5]), atol=0.02)
        lp = g.categorical.logpdf(2, logits=logits)
        assert jnp.allclose(lp, jnp.log(0.5), atol=1e-5)


class TestMultivariate:
    def test_mv_normal_diag(self):
        loc = jnp.array([1.0, -2.0])
        scale = jnp.array([0.5, 2.0])
        xs = sample_many(g.mv_normal_diag, N, loc, scale)
        assert jnp.allclose(jnp.mean(xs, 0), loc, atol=0.05)
        # density = product of normals
        lp = g.mv_normal_diag.logpdf(jnp.array([1.0, 0.0]), loc, scale)
        expected = g.normal.logpdf(1.0, 1.0, 0.5) + g.normal.logpdf(0.0, -2.0, 2.0)
        assert jnp.allclose(lp, expected, atol=1e-5)

    def test_mv_normal(self):
        loc = jnp.array([0.0, 1.0])
        cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
        xs = sample_many(g.mv_normal, N, loc, cov)
        emp_cov = jnp.cov(xs.T)
        assert jnp.allclose(emp_cov, cov, atol=0.1)
        # density vs scipy-style direct computation
        v = jnp.array([0.3, 0.7])
        diff = v - loc
        expected = (
            -0.5 * diff @ jnp.linalg.inv(cov) @ diff
            - 0.5 * jnp.log(jnp.linalg.det(cov))
            - jnp.log(2 * jnp.pi)
        )
        assert jnp.allclose(g.mv_normal.logpdf(v, loc, cov), expected, atol=1e-4)

    def test_dirichlet(self):
        conc = jnp.array([2.0, 3.0, 5.0])
        xs = sample_many(g.dirichlet, N, conc)
        assert jnp.allclose(jnp.mean(xs, 0), conc / 10.0, atol=0.02)
        assert jnp.allclose(jnp.sum(xs, -1), 1.0, atol=1e-5)

    def test_multinomial(self):
        probs = jnp.array([0.2, 0.3, 0.5])
        xs = sample_many(g.multinomial, 5000, 20.0, probs=probs)
        assert jnp.allclose(jnp.mean(xs, 0), 20.0 * probs, atol=0.2)
        assert jnp.allclose(jnp.sum(xs, -1), 20.0)
        # pmf sums over compositions of 3 with total 3 == 1
        from itertools import product as iproduct

        tot = 0.0
        for c in iproduct(range(4), repeat=3):
            if sum(c) == 3:
                tot += float(
                    jnp.exp(
                        g.multinomial.logpdf(jnp.array(c, float), 3.0, probs=probs)
                    )
                )
        assert abs(tot - 1.0) < 1e-4

    def test_dirichlet_multinomial(self):
        conc = jnp.array([1.0, 2.0, 3.0])
        xs = sample_many(g.dirichlet_multinomial, N, 12.0, conc)
        assert jnp.allclose(jnp.mean(xs, 0), 12.0 * conc / 6.0, rtol=0.05)

    def test_von_mises_fisher(self):
        mu = jnp.array([0.0, 0.0, 1.0])
        xs = sample_many(g.von_mises_fisher, 5000, mu, 10.0)
        assert jnp.allclose(jnp.linalg.norm(xs, axis=-1), 1.0, atol=1e-4)
        # mean resultant direction ~ mu; mean resultant length for kappa=10,
        # d=3 is coth(10) - 1/10 ~= 0.9
        r = jnp.mean(xs, 0)
        assert jnp.allclose(r / jnp.linalg.norm(r), mu, atol=0.05)
        assert jnp.allclose(jnp.linalg.norm(r), 0.9, atol=0.03)

    def test_power_spherical(self):
        mu = jnp.array([1.0, 0.0])
        xs = sample_many(g.power_spherical, 5000, mu, 5.0)
        assert jnp.allclose(jnp.linalg.norm(xs, axis=-1), 1.0, atol=1e-4)
        r = jnp.mean(xs, 0)
        assert jnp.allclose(r / jnp.linalg.norm(r), mu, atol=0.05)
        # density normalizes on the circle: integrate over angle
        thetas = jnp.linspace(-np.pi, np.pi, 20001)
        vs = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
        ps = jnp.exp(jax.vmap(lambda v: g.power_spherical.logpdf(v, mu, 5.0))(vs))
        assert jnp.allclose(jnp.trapezoid(ps, thetas), 1.0, atol=2e-2)


class TestSamplerDensityAgreement:
    """Histogram of samples vs density — catches sampler/density
    parameterization mismatches the other tests can miss."""

    @pytest.mark.parametrize(
        "dist,args,rng",
        [
            (g.gamma, (3.0, 2.0), (0.0, 8.0)),
            (g.beta, (2.0, 5.0), (0.0, 1.0)),
            (g.gumbel, (1.0, 2.0), (-6.0, 15.0)),
            (g.von_mises, (0.5, 2.0), (-np.pi, np.pi)),
            (g.moyal, (0.0, 1.0), (-3.0, 10.0)),
            (g.inverse_gaussian, (1.0, 2.0), (0.0, 5.0)),
            (g.kumaraswamy, (2.0, 3.0), (0.0, 1.0)),
            (g.lambert_w_normal, (0.5, 1.0, 0.15), (-8.0, 10.0)),
            (g.double_sided_maxwell, (0.0, 1.0), (-6.0, 6.0)),
            (g.weibull, (2.0, 1.5), (0.0, 5.0)),
        ],
        ids=lambda p: str(getattr(p, "__class__", type(p)).__name__)[:20],
    )
    def test_histogram_matches_density(self, dist, args, rng):
        xs = sample_many(dist, 40_000, *args)
        bins = jnp.linspace(rng[0], rng[1], 41)
        hist, edges = jnp.histogram(xs, bins=bins, density=True)
        centers = (edges[:-1] + edges[1:]) / 2
        dens = jnp.exp(jax.vmap(lambda x: dist.logpdf(x, *args))(centers))
        # compare where density is non-trivial
        mask = dens > 0.02
        rel_err = jnp.abs(hist - dens) / (dens + 1e-3)
        assert jnp.mean(jnp.where(mask, rel_err, 0.0)) < 0.12


class TestEdgeCases:
    def test_beta_quotient_normalizes(self):
        z = quad_normalization(g.beta_quotient, 1e-4, 60.0, 2.0, 3.0, 4.0, 3.0)
        assert jnp.allclose(z, 1.0, atol=3e-2), z

    def test_non_central_chi2_normalizes(self):
        z = quad_normalization(g.non_central_chi2, 1e-4, 80.0, 4.0, 3.0)
        assert jnp.allclose(z, 1.0, atol=3e-2), z

    def test_non_central_chi2_mean(self):
        xs = sample_many(g.non_central_chi2, N, 4.0, 3.0)
        assert jnp.allclose(jnp.mean(xs), 7.0, rtol=0.05)

    def test_exact_density_gfi(self):
        """Distributions implement the full GFI."""
        tr = g.normal.simulate(KEY, (0.0, 1.0))
        assert jnp.allclose(
            tr.get_score(), g.normal.logpdf(tr.get_retval(), 0.0, 1.0)
        )
        score, v = g.normal.assess(g.ChoiceMap.choice(0.5), (0.0, 1.0))
        assert jnp.allclose(score, g.normal.logpdf(0.5, 0.0, 1.0))
        tr2, w = g.normal.generate(KEY, g.ChoiceMap.choice(0.5), (0.0, 1.0))
        assert jnp.allclose(w, score)

    def test_sample_shape_kwarg(self):
        keys = jax.random.key(1)
        out = g.normal.sample(keys, 0.0, 1.0, sample_shape=g.Const((5,)))
        assert out.shape == (5,)
