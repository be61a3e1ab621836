"""ADEV gradient-estimation strategies.

Capability parity with reference `_src/adev/primitives.py:78-500`:
REINFORCE, flip enumeration (sequential + parallel), flip
measure-valued derivative, categorical enumeration, normal/mv-normal
reparameterization, uniform, beta-implicit, baseline variance reduction,
and cost accumulation — all built on native JAX samplers/densities.
"""

from typing import Any, Callable

import jax
import jax.numpy as jnp

from genjax_tpu.adev.core import (
    ADEVPrimitive,
    Dual,
    TailCallADEVPrimitive,
)
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import PRNGKey
from genjax_tpu.distributions.library import (
    _beta_logpdf,
    _flip_logpdf,
    _geometric_logpdf,
    _normal_logpdf,
)


@Pytree.dataclass
class REINFORCE(ADEVPrimitive):
    """Score-function estimator: dE/dθ estimated by
    `cont(v) * d log p(v; θ)/dθ` plus the continuation's own tangent."""

    sample_function: Callable[..., Any] = Pytree.static()
    differentiable_logpdf: Callable[..., Any] = Pytree.static()

    def sample(self, key, *args):
        return self.sample_function(key, *args)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        primals = Dual.tree_primal(dual_tree)
        tangents = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        v = self.sample(sub_key, *primals)
        out_dual = kdual(key, Dual.tree_pure(v))
        (out_primal,), (out_tangent,) = Dual.tree_unzip(out_dual)
        _, lp_tangent = jax.jvp(
            lambda *args: self.differentiable_logpdf(v, *args),
            tuple(primals),
            tuple(tangents),
        )
        return Dual(out_primal, out_tangent + out_primal * lp_tangent)


def reinforce(sample_func, logpdf_func) -> REINFORCE:
    return REINFORCE(sample_func, logpdf_func)


@Pytree.dataclass
class FlipEnum(ADEVPrimitive):
    """Exact enumeration over both branches of a Bernoulli draw (zero
    variance; the continuation runs once per branch)."""

    def sample(self, key, *args):
        (probs,) = args
        return jax.random.bernoulli(key, probs)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        true_dual = kdual(key, Dual(jnp.asarray(True), jnp.zeros(())))
        false_dual = kdual(key, Dual(jnp.asarray(False), jnp.zeros(())))
        (tp,), (tt,) = Dual.tree_unzip(true_dual)
        (fp,), (ft,) = Dual.tree_unzip(false_dual)

        def expectation(p, tl, fl):
            return p * tl + (1.0 - p) * fl

        out_primal, out_tangent = jax.jvp(
            expectation, (p_primal, tp, fp), (p_tangent, tt, ft)
        )
        return Dual(out_primal, out_tangent)


flip_enum = FlipEnum()


@Pytree.dataclass
class FlipMVD(ADEVPrimitive):
    """Measure-valued derivative estimator for a Bernoulli draw."""

    def sample(self, key, *args):
        (p,) = args
        return jax.random.bernoulli(key, p)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (kpure, kdual) = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        b = jax.random.bernoulli(sub_key, p_primal)
        b_dual = kdual(key, Dual.tree_pure(b))
        (b_primal,), (b_tangent,) = Dual.tree_unzip(b_dual)
        other = kpure(key, jnp.logical_not(b))
        est = jnp.where(b, 1.0, -1.0) * (other - b_primal) * -1.0
        return Dual(b_primal, b_tangent + est * p_tangent)


flip_mvd = FlipMVD()


@Pytree.dataclass
class FlipEnumParallel(ADEVPrimitive):
    """Enumeration with the two branch continuations batched via vmap."""

    def sample(self, key, *args):
        (p,) = args
        return jax.random.bernoulli(key, p)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        sub_keys = jax.random.split(key, 2)
        vals = jnp.array([True, False])

        def run(key, v):
            d = kdual(key, Dual(v, jnp.zeros(())))
            (p,), (t,) = Dual.tree_unzip(d)
            return p, t

        ret_primals, ret_tangents = jax.vmap(run)(sub_keys, vals)

        def expectation(p, rets):
            return jnp.sum(jnp.array([p, 1.0 - p]) * rets)

        return Dual(
            *jax.jvp(expectation, (p_primal, ret_primals), (p_tangent, ret_tangents))
        )


flip_enum_parallel = FlipEnumParallel()


@Pytree.dataclass
class CategoricalEnumParallel(ADEVPrimitive):
    """Exact enumeration over the categories of a categorical draw, with
    the per-category continuations batched via vmap."""

    def sample(self, key, *args):
        (probs,) = args
        return jax.random.categorical(key, jnp.log(probs))

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (probs_primal,) = Dual.tree_primal(dual_tree)
        (probs_tangent,) = Dual.tree_tangent(dual_tree)
        n = probs_primal.shape[-1]
        idxs = jnp.arange(n)
        sub_keys = jax.random.split(key, n)

        def run(key, idx):
            d = kdual(key, Dual(idx, jnp.zeros((), dtype=idx.dtype)))
            (p,), (t,) = Dual.tree_unzip(d)
            return p, t

        ret_primals, ret_tangents = jax.vmap(run)(sub_keys, idxs)

        def expectation(probs, rets):
            return jnp.sum(jax.nn.softmax(probs) * rets)

        return Dual(
            *jax.jvp(
                expectation,
                (probs_primal, ret_primals),
                (probs_tangent, ret_tangents),
            )
        )


categorical_enum_parallel = CategoricalEnumParallel()


flip_reinforce = reinforce(
    lambda key, p: jax.random.bernoulli(key, p),
    lambda v, p: _flip_logpdf(v, p),
)

geometric_reinforce = reinforce(
    lambda key, p: jax.random.geometric(key, p) - 1,
    lambda v, p: _geometric_logpdf(v, probs=p),
)

normal_reinforce = reinforce(
    lambda key, loc, scale: loc + scale * jax.random.normal(key),
    lambda v, loc, scale: _normal_logpdf(v, loc, scale),
)


@Pytree.dataclass
class NormalREPARAM(TailCallADEVPrimitive):
    """Reparameterization: `v = mu + sigma * eps`, `eps ~ N(0, 1)` — the
    derivative flows through the sample deterministically."""

    def sample(self, key, *args):
        loc, scale = args
        return loc + scale * jax.random.normal(key, shape=jnp.shape(loc + scale))

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        (mu_primal, sigma_primal) = Dual.tree_primal(dual_tree)
        (mu_tangent, sigma_tangent) = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        eps = jax.random.normal(
            sub_key, shape=jnp.shape(mu_primal + sigma_primal)
        )
        primal_out, tangent_out = jax.jvp(
            lambda mu, sigma: mu + sigma * eps,
            (mu_primal, sigma_primal),
            (mu_tangent, sigma_tangent),
        )
        return Dual(primal_out, tangent_out)


normal_reparam = NormalREPARAM()


@Pytree.dataclass
class MvNormalDiagREPARAM(TailCallADEVPrimitive):
    def sample(self, key, *args):
        loc, scale_diag = args
        return loc + scale_diag * jax.random.normal(key, shape=loc.shape)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        (loc_primal, scale_primal) = Dual.tree_primal(dual_tree)
        (loc_tangent, scale_tangent) = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        eps = jax.random.normal(sub_key, shape=loc_primal.shape)
        primal_out, tangent_out = jax.jvp(
            lambda loc, scale: loc + scale * eps,
            (loc_primal, scale_primal),
            (loc_tangent, scale_tangent),
        )
        return Dual(primal_out, tangent_out)


mv_normal_diag_reparam = MvNormalDiagREPARAM()


@Pytree.dataclass
class MvNormalREPARAM(TailCallADEVPrimitive):
    """Full-covariance reparameterization via Cholesky."""

    def sample(self, key, *args):
        mu, cov = args
        return jax.random.multivariate_normal(key, mu, cov)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        (mu_primal, cov_primal) = Dual.tree_primal(dual_tree)
        (mu_tangent, cov_tangent) = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        eps = jax.random.normal(sub_key, shape=mu_primal.shape)

        def transform(mu, cov):
            chol = jnp.linalg.cholesky(cov)
            return mu + chol @ eps

        primal_out, tangent_out = jax.jvp(
            transform, (mu_primal, cov_primal), (mu_tangent, cov_tangent)
        )
        return Dual(primal_out, tangent_out)


mv_normal_reparam = MvNormalREPARAM()


@Pytree.dataclass
class Uniform(TailCallADEVPrimitive):
    def sample(self, key, *_args):
        return jax.random.uniform(key)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        key, sub_key = jax.random.split(key)
        x = jax.random.uniform(sub_key)
        return Dual(x, jnp.zeros(()))


uniform = Uniform()


@Pytree.dataclass
class BetaIMPLICIT(TailCallADEVPrimitive):
    """Implicit reparameterization for Beta draws (Figurnov et al. 2018):
    the pathwise derivative `dv/dtheta = -(dF/dtheta) / p(v)` realized via
    JVP through the CDF (`betainc` is differentiable in all arguments in
    JAX)."""

    def sample(self, key, *args):
        alpha, beta = args
        return jax.random.beta(key, alpha, beta)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        from jax.scipy.special import betainc

        (a_primal, b_primal) = Dual.tree_primal(dual_tree)
        (a_tangent, b_tangent) = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        v = jax.random.beta(sub_key, a_primal, b_primal)
        # dF(v; a, b)/d(a, b) with v fixed. JAX's `betainc` has no gradient
        # rule w.r.t. the shape parameters, so use central differences on
        # the CDF (the CDF is smooth in (a, b); 1e-4-relative steps give
        # ~1e-6 accuracy, far below estimator noise).
        ha = 1e-4 * jnp.maximum(a_primal, 1.0)
        hb = 1e-4 * jnp.maximum(b_primal, 1.0)
        dF_da = (betainc(a_primal + ha, b_primal, v) - betainc(a_primal - ha, b_primal, v)) / (2.0 * ha)
        dF_db = (betainc(a_primal, b_primal + hb, v) - betainc(a_primal, b_primal - hb, v)) / (2.0 * hb)
        dF = dF_da * a_tangent + dF_db * b_tangent
        log_pdf = _beta_logpdf(v, a_primal, b_primal)
        dv = -dF / jnp.exp(log_pdf)
        return Dual(v, dv)


beta_implicit = BetaIMPLICIT()


@Pytree.dataclass
class Baseline(ADEVPrimitive):
    """Variance reduction: subtract a baseline `b` from the continuation
    value inside the wrapped strategy, then add it back outside."""

    prim: ADEVPrimitive

    def sample(self, key, *args):
        return self.prim.sample(key, *args[1:])

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (kpure, kdual) = konts
        (b_primal, *prim_primals) = Dual.tree_primal(dual_tree)
        (b_tangent, *prim_tangents) = Dual.tree_tangent(dual_tree)

        def shifted_kdual(key, dual):
            ret = kdual(key, dual)
            primal, tangent = jax.jvp(
                lambda r, b: r - b,
                (ret.primal, b_primal),
                (ret.tangent, b_tangent),
            )
            return Dual(primal, tangent)

        def shifted_kpure(key, *args):
            return kpure(key, *args) - b_primal

        inner = self.prim.jvp_estimate(
            key,
            Dual.dual_tree(prim_primals, prim_tangents),
            (shifted_kpure, shifted_kdual),
        )
        primal, tangent = jax.jvp(
            lambda l, b: l + b, (inner.primal, b_primal), (inner.tangent, b_tangent)
        )
        return Dual(primal, tangent)


def baseline(prim: ADEVPrimitive) -> Baseline:
    return Baseline(prim)


@Pytree.dataclass
class AddCost(ADEVPrimitive):
    """Accumulate an extra (differentiable) cost term into the objective."""

    def sample(self, key, *args):
        (w,) = args
        return w

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (w,) = Dual.tree_primal(dual_tree)
        (w_tangent,) = Dual.tree_tangent(dual_tree)
        l_dual = kdual(key, Dual(jnp.zeros(()), jnp.zeros(())))
        return Dual(w + l_dual.primal, w_tangent + l_dual.tangent)


def add_cost(w):
    prim = AddCost()
    prim(w)
