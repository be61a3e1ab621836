"""Out-of-support scores are -inf, never NaN or a wrong finite value.

Under the GFI any value of the right shape can reach a logpdf —
`Update`/`generate` constraints transplanted across Switch branches, Mask
flips, or user choice maps (found by the structural fuzzer: a normal draw
constrained onto a beta site scored NaN and poisoned the whole edit
algebra). The reference's TFP densities return NaN (or silently wrong
finite values) here; this library deliberately scores zero-density values
`-inf` (`distributions/library.py::_guard_support`), which the edit
algebra propagates as "impossible trace" (MH rejects, importance weight
-inf). These tests pin the guard for every bounded-support distribution
and prove the double-`where` keeps in-support gradients NaN-free.
"""

import jax
import jax.numpy as jnp
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff, Update

# (distribution, args, out-of-support values, an in-support value)
CASES = [
    (g.beta, (2.0, 2.0), [-0.5, 1.5], 0.3),
    (g.gamma, (2.0, 1.0), [-1.0], 1.3),
    (g.gamma, (1.0, 2.0), [-1.0], 1.3),  # c=1: was finite-wrong, not NaN
    (g.chi2, (4.0,), [-2.0], 1.0),
    (g.chi, (3.0,), [-2.0], 1.0),
    (g.inverse_gamma, (3.0, 2.0), [-1.0, 0.0], 1.0),
    (g.log_normal, (0.0, 1.0), [-1.0, 0.0], 1.0),
    (g.logit_normal, (0.0, 1.0), [-0.5, 0.0, 1.0, 1.5], 0.4),
    (g.weibull, (2.0, 1.0), [-1.0], 1.0),
    (g.weibull, (1.0, 1.0), [-1.0], 1.0),  # c=1: was finite-wrong
    (g.kumaraswamy, (2.0, 3.0), [-0.5, 1.5], 0.3),
    (g.inverse_gaussian, (1.0, 2.0), [-1.0, 0.0], 1.0),
    (g.exponential, (2.0,), [-1.0], 1.0),
    (g.half_normal, (1.0,), [-1.0], 1.0),
    (g.half_cauchy, (0.0, 1.0), [-1.0], 1.0),
    (g.half_student_t, (3.0, 0.0, 1.0), [-1.0], 1.0),
    (g.uniform, (0.0, 1.0), [-0.5, 1.5], 0.5),
    (g.truncated_normal, (0.0, 1.0, -1.0, 1.0), [-2.0, 2.0], 0.5),
    (g.truncated_cauchy, (0.0, 1.0, -1.0, 1.0), [-2.0, 2.0], 0.5),
    (g.beta_quotient, (2.0, 2.0, 2.0, 2.0), [-0.5, 0.0], 0.7),
    (g.non_central_chi2, (4.0, 1.0), [-1.0, 0.0], 2.0),
    (g.poisson, (2.0,), [-1, -2], 3),
    (g.geometric, ((), {"probs": 0.3}), [-1], 2),
    (g.negative_binomial, ((), {"total_count": 3.0, "probs": 0.4}), [-1], 2),
    (g.binomial, ((), {"total_count": 5.0, "probs": 0.4}), [-1, 6], 3),
    (
        g.beta_binomial,
        ((), {"total_count": 5.0, "concentration1": 2.0, "concentration0": 2.0}),
        [-1, 6],
        3,
    ),
    (g.zipf, (2.0,), [0, -1], 3),
]


def _call_logpdf(dist, args, v):
    if (
        isinstance(args, tuple)
        and len(args) == 2
        and isinstance(args[0], tuple)
        and isinstance(args[1], dict)
    ):
        return dist.logpdf(v, *args[0], **args[1])
    return dist.logpdf(v, *args)


@pytest.mark.smoke
class TestSupportGuards:
    @pytest.mark.parametrize(
        "dist,args,oos,ins",
        CASES,
        ids=[f"{type(c[0]).__name__}-{i}" for i, c in enumerate(CASES)],
    )
    def test_out_of_support_is_neg_inf(self, dist, args, oos, ins):
        for v in oos:
            lp = _call_logpdf(dist, args, v)
            assert jnp.isneginf(lp), f"{type(dist).__name__}.logpdf({v}) = {lp}"
        lp_in = _call_logpdf(dist, args, ins)
        assert jnp.isfinite(lp_in), f"{type(dist).__name__}.logpdf({ins}) = {lp_in}"

    @pytest.mark.parametrize(
        "dist,args,ins",
        [(d, a, i) for d, a, o, i in CASES if not isinstance(i, int)],
        ids=[
            f"{type(c[0]).__name__}-{i}"
            for i, c in enumerate(CASES)
            if not isinstance(c[3], int)
        ],
    )
    def test_gradient_finite_in_support(self, dist, args, ins):
        # Double-where: the -inf branch must not leak NaN into gradients
        # at in-support points (HMC/MALA/ADEV differentiate these).
        grad = jax.grad(lambda v: _call_logpdf(dist, args, v))(
            jnp.float32(ins)
        )
        assert jnp.isfinite(grad), f"{type(dist).__name__} grad at {ins} = {grad}"

    def test_bernoulli_flip_support(self):
        assert jnp.isneginf(g.flip.logpdf(0.5, 0.3))
        assert jnp.isneginf(g.bernoulli.logpdf(2, logits=0.0))
        assert jnp.isfinite(g.flip.logpdf(True, 0.3))
        assert jnp.isfinite(g.bernoulli.logpdf(1, logits=0.0))

    def test_categorical_no_index_wrap(self):
        logits = jnp.array([0.0, 1.0, 2.0])
        # -1 used to WRAP to the last (highest-probability!) category.
        assert jnp.isneginf(g.categorical.logpdf(-1, logits=logits))
        assert jnp.isneginf(g.categorical.logpdf(3, logits=logits))
        lp = g.categorical.logpdf(jnp.array([0, -1, 2]), logits=logits)
        assert jnp.isneginf(lp[1]) and jnp.isfinite(lp[0])
        # Batched logits rows too.
        rows = jnp.stack([logits, logits])
        lp2 = g.categorical.logpdf(jnp.array([1, -1]), logits=rows)
        assert jnp.isfinite(lp2[0]) and jnp.isneginf(lp2[1])

    def test_multinomial_sum_guard(self):
        probs = jnp.array([0.2, 0.3, 0.5])
        ok = jnp.array([1.0, 2.0, 2.0])
        bad_sum = jnp.array([1.0, 1.0, 1.0])
        neg = jnp.array([-1.0, 3.0, 3.0])
        assert jnp.isfinite(g.multinomial.logpdf(ok, 5.0, probs=probs))
        assert jnp.isneginf(g.multinomial.logpdf(bad_sum, 5.0, probs=probs))
        assert jnp.isneginf(g.multinomial.logpdf(neg, 5.0, probs=probs))
        a = jnp.array([1.0, 1.0, 1.0])
        assert jnp.isfinite(g.dirichlet_multinomial.logpdf(ok, 5.0, a))
        assert jnp.isneginf(g.dirichlet_multinomial.logpdf(bad_sum, 5.0, a))

    def test_dirichlet_component_guard(self):
        a = jnp.array([2.0, 2.0, 2.0])
        ok = jnp.array([0.2, 0.3, 0.5])
        neg = jnp.array([-0.2, 0.7, 0.5])
        assert jnp.isfinite(g.dirichlet.logpdf(ok, a))
        assert jnp.isneginf(g.dirichlet.logpdf(neg, a))

    def test_boundary_values_keep_formula_limits(self):
        # The guards use closed/open intervals that preserve xlogy's
        # correct boundary limits rather than clipping them away.
        assert jnp.isneginf(g.beta.logpdf(0.0, 2.0, 2.0))  # density -> 0
        assert jnp.isposinf(g.beta.logpdf(0.0, 0.5, 2.0))  # integrable sing.
        assert float(g.gamma.logpdf(0.0, 1.0, 2.0)) == pytest.approx(
            float(jnp.log(2.0)), abs=1e-6
        )  # Exp(2) at 0


@pytest.mark.smoke
class TestImpossibleEditSemantics:
    """Cross-branch transplants flow through the edit algebra as -inf
    weights (impossible state), never NaN — the fuzzer finding that
    motivated the guards, pinned as a deterministic regression."""

    def _model(self):
        @g.gen
        def beta_branch(x):
            v = g.beta(1.0 + jax.nn.softplus(x), 2.0) @ "v"
            return v - 0.5

        @g.gen
        def normal_branch(x):
            v = g.normal(x, 1.0) @ "v"
            return v * 0.5

        sw = g.switch(beta_branch, normal_branch)

        @g.gen
        def model(x):
            b = g.flip(0.5) @ "idx"
            r = sw(jnp.int32(b), (x,), (x + 0.5,)) @ "sw"
            return r

        return model

    def test_cross_branch_update_weighs_neg_inf(self):
        model = self._model()
        args = (jnp.float32(-0.4),)
        # Force a trace on the beta branch (idx=False) and transplant a
        # negative "v" (legal on the normal branch, impossible on beta).
        tr, _ = model.generate(
            jax.random.key(0),
            ChoiceMap.d({"idx": False, ("sw", "v"): 0.4}),
            args,
        )
        constraint = ChoiceMap.d({("sw", "v"): -0.7})
        new_tr, w, _, bwd = model.edit(
            jax.random.key(1), tr, Update(constraint), Diff.no_change(args)
        )
        assert jnp.isneginf(w), w
        assert jnp.isneginf(new_tr.get_score())
        # Telescoping holds in the -inf form and the backward edit
        # restores the original finite state with weight +inf.
        back, w_back, _, _ = model.edit(
            jax.random.key(2), new_tr, bwd, Diff.no_change(args)
        )
        assert jnp.isposinf(w_back), w_back
        assert jnp.allclose(back.get_score(), tr.get_score())

    def test_masked_off_neg_inf_scores_zero(self):
        # 0 * -inf is NaN; the mask combinator must select, not multiply.
        @g.gen
        def inner():
            v = g.beta(2.0, 2.0) @ "v"
            return v

        masked = inner.mask()

        @g.gen
        def model(on):
            r = masked(on) @ "mk"
            return r.value

        # assess with an out-of-support value under flag OFF: the
        # subtree does not exist, so its impossible value contributes 0.
        score, _ = model.assess(
            ChoiceMap.d({("mk", "v"): -0.7}), (False,)
        )
        assert jnp.allclose(score, 0.0), score
        # Under flag ON the same constraint is impossible: -inf.
        score_on, _ = model.assess(
            ChoiceMap.d({("mk", "v"): -0.7}), (True,)
        )
        assert jnp.isneginf(score_on), score_on
