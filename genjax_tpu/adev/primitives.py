"""ADEV gradient-estimation strategies.

Capability parity with reference `_src/adev/primitives.py:78-500`:
REINFORCE, flip enumeration (sequential + parallel), flip
measure-valued derivative, categorical enumeration, normal/mv-normal
reparameterization, uniform, beta-implicit, baseline variance reduction,
and cost accumulation — all built on native JAX samplers/densities.

Beyond the reference (`adev/core.py:159-163` raises on every non-reparam
strategy under `vmap`): every strategy here is **vmap-sound**. When a
sample site is vectorized (e.g. a guide inside `ImportanceK`'s particle
vmap), the batching rule rebinds the site with a batched strategy:

* `REINFORCE` batches exactly — one continuation call on the whole batch;
  the score term sums the per-site `d log p` contributions (each site's
  contribution keeps the standard single-sample estimator form, so the
  batched estimator is unbiased).
* Enumeration strategies (`FlipEnum`, `FlipEnumParallel`,
  `CategoricalEnumParallel`) batch via **per-site Rao-Blackwellization**:
  exact joint enumeration over n sites is exponential, so each site is
  enumerated exactly while the other sites hold their sampled values —
  n·|support| continuation calls, each on a full batch (O(n²·|support|)
  work; prefer `reinforce` for very large batches). Unbiased; reduces to
  exact enumeration at batch size 1.
* `FlipMVD` batches the measure-valued derivative per site with the
  shared-sample coupling (n pure-continuation calls).
* `Baseline` composes: per-site baselines feed the batched REINFORCE
  score term; for enumeration/MVD/reparam inners the baseline shift
  cancels identically, so the baseline argument is dropped.
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


def _to_leading_axis(x, dim, size: int):
    """Normalize one batched argument to a leading batch axis of length
    `size` (broadcasting unbatched arguments)."""
    x = jnp.asarray(x)
    if dim is None:
        return jnp.broadcast_to(x, (size,) + jnp.shape(x))
    return jnp.moveaxis(x, dim, 0)


def _leading_batch(tree, tree_dims, size: int):
    """Map `_to_leading_axis` over an argument tree and its dims tree."""
    import jax.tree_util as jtu

    return jtu.tree_map(
        lambda x, d: _to_leading_axis(x, d, size),
        list(tree),
        list(tree_dims),
        is_leaf=lambda d: d is None,
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
        k_draw, k_cont = jax.random.split(key)
        theta = tuple(Dual.tree_primal(dual_tree))
        theta_dot = tuple(Dual.tree_tangent(dual_tree))

        # Draw v ~ p(.; θ), then measure how the log-density at the *fixed*
        # draw moves with θ — the score part of the estimator.
        v = self.sample(k_draw, *theta)
        _, score_dot = jax.jvp(
            lambda *a: self.differentiable_logpdf(v, *a), theta, theta_dot
        )

        # Continuation value L(v) and its own tangent (θ may also enter
        # the loss downstream of the sample).
        (loss,), (loss_dot,) = Dual.tree_unzip(kdual(k_cont, Dual.tree_pure(v)))
        return Dual(loss, loss_dot + loss * score_dot)

    def get_batched_prim(self, dims: tuple, size: int) -> ADEVPrimitive:
        return BatchedREINFORCE(self, None, dims, size)


def reinforce(sample_func, logpdf_func) -> REINFORCE:
    return REINFORCE(sample_func, logpdf_func)


@Pytree.dataclass
class BatchedREINFORCE(ADEVPrimitive):
    """`REINFORCE` lifted over a batch of `size` independent sites.

    One continuation call on the whole batch; the score term accumulates
    every site's `L · ∂ log p(v_i; θ_i)` (with an optional per-site
    baseline `L - b_i`). Unbiased: each site's term is the standard
    single-sample score-function estimator, and expectation is linear.
    `dims` are the batch axes of `(key, *args)` at the vmapped call site —
    `(key, baseline, *args)` when `with_baseline`.
    """

    original: REINFORCE
    with_baseline: bool | None = Pytree.static()
    dims: tuple = Pytree.static()
    size: int = Pytree.static()

    def sample(self, key, *args):
        if self.with_baseline:
            args = args[1:]
            in_axes = (self.dims[0], *self.dims[2:])
        else:
            in_axes = self.dims
        return jax.vmap(
            lambda k, *a: self.original.sample_function(k, *a), in_axes=in_axes
        )(key, *args)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        primals = list(Dual.tree_primal(dual_tree))
        tangents = list(Dual.tree_tangent(dual_tree))
        arg_dims = list(self.dims[1:])
        if self.with_baseline:
            b_dim, arg_dims = arg_dims[0], arg_dims[1:]
            (b,), primals = primals[:1], primals[1:]
            tangents = tangents[1:]
            b = _to_leading_axis(b, b_dim, self.size)
        else:
            b = 0.0

        key, k_draw = jax.random.split(key)
        draw_keys = jax.random.split(k_draw, self.size)
        v = jax.vmap(self.original.sample_function, in_axes=(0, *arg_dims))(
            draw_keys, *primals
        )
        out_dual = kdual(key, Dual.tree_pure(v))
        (out_primal,), (out_tangent,) = Dual.tree_unzip(out_dual)

        def weighted_total_logpdf(*args):
            site_lps = jax.vmap(
                self.original.differentiable_logpdf, in_axes=(0, *arg_dims)
            )(v, *args)
            # Per-site weighting happens inside the differentiated total so
            # one JVP yields Σ_i (L - b_i) ∂logp_i. The weights are
            # constants w.r.t. the JVP (stop_gradient-free because they
            # enter as closure values, not jvp inputs).
            return jnp.sum((out_primal - b) * site_lps)

        _, score_tangent = jax.jvp(
            weighted_total_logpdf, tuple(primals), tuple(tangents)
        )
        return Dual(out_primal, out_tangent + score_tangent)


@Pytree.dataclass
class FlipEnum(ADEVPrimitive):
    """Exact enumeration over both branches of a Bernoulli draw (zero
    variance; the continuation runs once per branch)."""

    def sample(self, key, *args):
        (probs,) = args
        return jax.random.bernoulli(key, probs)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (p,) = Dual.tree_primal(dual_tree)
        (p_dot,) = Dual.tree_tangent(dual_tree)
        # Run the continuation on both outcomes (same key: the branches
        # share all downstream randomness, which only reduces variance).
        (l_t,), (ld_t,) = Dual.tree_unzip(
            kdual(key, Dual(jnp.asarray(True), jnp.zeros(())))
        )
        (l_f,), (ld_f,) = Dual.tree_unzip(
            kdual(key, Dual(jnp.asarray(False), jnp.zeros(())))
        )
        # E = p·L_T + (1-p)·L_F, differentiated by hand:
        #   Ė = ṗ·(L_T - L_F) + p·L̇_T + (1-p)·L̇_F.
        value = p * l_t + (1.0 - p) * l_f
        d_value = p_dot * (l_t - l_f) + p * ld_t + (1.0 - p) * ld_f
        return Dual(value, d_value)

    def get_batched_prim(self, dims: tuple, size: int) -> ADEVPrimitive:
        return BatchedFlipEnum(self, dims, size)


flip_enum = FlipEnum()


@Pytree.dataclass
class BatchedFlipEnum(ADEVPrimitive):
    """Per-site Rao-Blackwellized enumeration over a batch of Bernoulli
    sites. Exact joint enumeration over n sites costs 2^n continuation
    calls; instead each site is enumerated exactly with the others held at
    their sampled values (2n continuation calls, shared downstream
    randomness):

        primal  = mean_i [ p_i·L(b|b_i=T) + (1-p_i)·L(b|b_i=F) ]
        tangent = mean_i [ p_i·L̇_T,i + (1-p_i)·L̇_F,i ]
                  + Σ_i ṗ_i·(L_T,i - L_F,i)

    Both terms are unbiased: `L_T,i - L_F,i` is a one-sample estimate of
    ∂E/∂p_i (conditioned on b_{-i} ~ their marginals), and each bracket in
    the mean is an unbiased estimate of E[L] / E[L̇]. At n=1 this *is*
    exact enumeration.
    """

    original: ADEVPrimitive
    dims: tuple = Pytree.static()
    size: int = Pytree.static()

    def sample(self, key, *args):
        return jax.vmap(self.original.sample, in_axes=self.dims)(key, *args)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        (p_dim,) = self.dims[1:]
        n = self.size
        p = _to_leading_axis(p_primal, p_dim, n)
        p_dot = _to_leading_axis(p_tangent, p_dim, n)

        key, k_draw = jax.random.split(key)
        b = jax.random.bernoulli(k_draw, p)
        site = jnp.eye(n, dtype=bool)
        candidates = jnp.concatenate(
            [
                jnp.where(site, True, b[None, :]),
                jnp.where(site, False, b[None, :]),
            ],
            axis=0,
        )  # [2n, n]

        out = jax.vmap(
            lambda bb: kdual(key, Dual(bb, jnp.zeros(bb.shape)))
        )(candidates)
        (out_p,), (out_t,) = Dual.tree_unzip(out)
        L_true, L_false = out_p[:n], out_p[n:]
        Ldot_true, Ldot_false = out_t[:n], out_t[n:]

        primal = jnp.mean(p * L_true + (1.0 - p) * L_false)
        tangent = jnp.mean(p * Ldot_true + (1.0 - p) * Ldot_false) + jnp.sum(
            p_dot * (L_true - L_false)
        )
        return Dual(primal, tangent)


@Pytree.dataclass
class FlipMVD(ADEVPrimitive):
    """Measure-valued derivative estimator for a Bernoulli draw."""

    def sample(self, key, *args):
        (p,) = args
        return jax.random.bernoulli(key, p)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (kpure, kdual) = konts
        (p,) = Dual.tree_primal(dual_tree)
        (p_dot,) = Dual.tree_tangent(dual_tree)
        k_draw, k_cont = jax.random.split(key)
        b = jax.random.bernoulli(k_draw, p)
        # Dual pass at the sampled outcome, plus one coupled pure pass at
        # the flipped outcome (shared continuation key).
        (loss,), (loss_dot,) = Dual.tree_unzip(kdual(k_cont, Dual.tree_pure(b)))
        flipped_loss = kpure(k_cont, jnp.logical_not(b))
        # MVD for Bernoulli: dE/dp = L(True,·) - L(False,·); the sampled
        # run supplies whichever branch b landed on.
        d_dp = jnp.where(b, loss - flipped_loss, flipped_loss - loss)
        return Dual(loss, loss_dot + d_dp * p_dot)

    def get_batched_prim(self, dims: tuple, size: int) -> ADEVPrimitive:
        return BatchedFlipMVD(self, dims, size)


flip_mvd = FlipMVD()


@Pytree.dataclass
class BatchedFlipMVD(ADEVPrimitive):
    """Per-site measure-valued derivative over a batch of Bernoulli sites
    with the shared-sample coupling: one dual continuation call at the
    sampled batch, plus n pure calls with one site flipped each —
    `∂E/∂p_i` estimated by `±(L(b) - L(b with i flipped))`."""

    original: ADEVPrimitive
    dims: tuple = Pytree.static()
    size: int = Pytree.static()

    def sample(self, key, *args):
        return jax.vmap(self.original.sample, in_axes=self.dims)(key, *args)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (kpure, kdual) = konts
        (p_primal,) = Dual.tree_primal(dual_tree)
        (p_tangent,) = Dual.tree_tangent(dual_tree)
        (p_dim,) = self.dims[1:]
        n = self.size
        p = _to_leading_axis(p_primal, p_dim, n)
        p_dot = _to_leading_axis(p_tangent, p_dim, n)

        key, k_draw = jax.random.split(key)
        b = jax.random.bernoulli(k_draw, p)
        out = kdual(key, Dual(b, jnp.zeros(b.shape)))
        (L,), (L_dot,) = Dual.tree_unzip(out)

        site = jnp.eye(n, dtype=bool)
        flipped = jnp.where(site, ~b[None, :], b[None, :])  # [n, n]
        others = jax.vmap(lambda bb: kpure(key, bb))(flipped)  # [n]
        # ∂E/∂p_i ≈ L(b_i=T, ·) - L(b_i=F, ·): when b_i sampled True the
        # flipped run supplies the False value, and vice versa.
        est = jnp.where(b, L - others, others - L)
        return Dual(L, L_dot + jnp.sum(est * p_dot))


@Pytree.dataclass
class FlipEnumParallel(ADEVPrimitive):
    """Enumeration with the two branch continuations batched via vmap."""

    def sample(self, key, *args):
        (p,) = args
        return jax.random.bernoulli(key, p)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (p,) = Dual.tree_primal(dual_tree)
        (p_dot,) = Dual.tree_tangent(dual_tree)

        def branch(k, outcome):
            (l,), (ld,) = Dual.tree_unzip(kdual(k, Dual(outcome, jnp.zeros(()))))
            return l, ld

        losses, loss_dots = jax.vmap(branch)(
            jax.random.split(key, 2), jnp.array([True, False])
        )
        weights = jnp.stack([p, 1.0 - p])
        d_weights = jnp.stack([p_dot, -p_dot])
        # Product rule on Σ w_k·L_k.
        return Dual(
            weights @ losses, d_weights @ losses + weights @ loss_dots
        )

    def get_batched_prim(self, dims: tuple, size: int) -> ADEVPrimitive:
        return BatchedFlipEnum(self, dims, size)


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
        (probs,) = Dual.tree_primal(dual_tree)
        (probs_dot,) = Dual.tree_tangent(dual_tree)
        n_cat = probs.shape[-1]

        def branch(k, category):
            d = kdual(k, Dual(category, jnp.zeros((), dtype=category.dtype)))
            (l,), (ld,) = Dual.tree_unzip(d)
            return l, ld

        losses, loss_dots = jax.vmap(branch)(
            jax.random.split(key, n_cat), jnp.arange(n_cat)
        )
        # `probs` are (unnormalized) probabilities — the same convention as
        # `sample` (`categorical(key, log(probs))`) and the
        # `vi.categorical_enum` density. (A softmax/logits convention here
        # would silently disagree with the sampler for non-uniform probs.)
        # Normalize π = w/Σw and differentiate the quotient by hand:
        #   π̇_k = (ẇ_k - π_k·Σẇ) / Σw.
        total = jnp.sum(probs)
        pi = probs / total
        pi_dot = (probs_dot - pi * jnp.sum(probs_dot)) / total
        return Dual(pi @ losses, pi_dot @ losses + pi @ loss_dots)

    def get_batched_prim(self, dims: tuple, size: int) -> ADEVPrimitive:
        return BatchedCategoricalEnum(self, dims, size)


categorical_enum_parallel = CategoricalEnumParallel()


@Pytree.dataclass
class BatchedCategoricalEnum(ADEVPrimitive):
    """Per-site Rao-Blackwellized enumeration over a batch of categorical
    sites (n sites × C categories → n·C continuation calls; others held at
    their sampled values). See `BatchedFlipEnum` for the estimator
    derivation; here the per-site weights are the normalized probability
    rows and the ∂/∂probs term flows through the normalization JVP."""

    original: ADEVPrimitive
    dims: tuple = Pytree.static()
    size: int = Pytree.static()

    def sample(self, key, *args):
        return jax.vmap(self.original.sample, in_axes=self.dims)(key, *args)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (probs_primal,) = Dual.tree_primal(dual_tree)
        (probs_tangent,) = Dual.tree_tangent(dual_tree)
        (probs_dim,) = self.dims[1:]
        n = self.size
        probs = _to_leading_axis(probs_primal, probs_dim, n)  # [n, C]
        probs_dot = _to_leading_axis(probs_tangent, probs_dim, n)
        c = probs.shape[-1]

        key, k_draw = jax.random.split(key)
        v = jax.random.categorical(key=k_draw, logits=jnp.log(probs), axis=-1)  # [n]

        site_of = jnp.repeat(jnp.arange(n), c)  # [n*C]
        cat_of = jnp.tile(jnp.arange(c), n)  # [n*C]
        candidates = (
            jnp.broadcast_to(v, (n * c, n))
            .at[jnp.arange(n * c), site_of]
            .set(cat_of)
        )  # [n*C, n]

        out = jax.vmap(
            lambda vv: kdual(key, Dual(vv, jnp.zeros(vv.shape, dtype=vv.dtype)))
        )(candidates)
        (out_p,), (out_t,) = Dual.tree_unzip(out)
        L = out_p.reshape(n, c)
        L_dot = out_t.reshape(n, c)

        def site_means(pr, rets):
            pi = pr / jnp.sum(pr, axis=-1, keepdims=True)
            return jnp.sum(pi * rets, axis=-1)  # [n]

        # Pass-through term: mean over sites of the π-weighted L̇ rows.
        pass_primal = jnp.mean(site_means(probs, L))
        pass_tangent = jnp.mean(site_means(probs, L_dot))
        # Probability term: Σ_i Σ_c π̇_{i,c} L_{i,c} (no 1/n — each site's
        # partial derivative needs its own full contribution).
        _, pi_dot = jax.jvp(
            lambda pr: pr / jnp.sum(pr, axis=-1, keepdims=True),
            (probs,),
            (probs_dot,),
        )
        prob_tangent = jnp.sum(pi_dot * L)
        return Dual(pass_primal, pass_tangent + prob_tangent)


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
        (mu, sigma) = Dual.tree_primal(dual_tree)
        (mu_dot, sigma_dot) = Dual.tree_tangent(dual_tree)
        _, k_eps = jax.random.split(key)
        eps = jax.random.normal(k_eps, shape=jnp.shape(mu + sigma))
        # v = μ + σ·ε is linear in (μ, σ) given ε, so the pathwise
        # derivative is simply v̇ = μ̇ + σ̇·ε.
        return Dual(mu + sigma * eps, mu_dot + sigma_dot * eps)


normal_reparam = NormalREPARAM()


@Pytree.dataclass
class PushforwardREPARAM(TailCallADEVPrimitive):
    """Generic pathwise strategy for an arbitrary differentiable
    push-forward of standard-normal noise: `v = T(eps, *args)` with
    `eps ~ N(0, I_{eps_shape})` held fixed under differentiation.

    `NormalREPARAM` is the special case `T(eps, mu, sigma) = mu + sigma*eps`;
    this generalization is the building block behind normalizing-flow
    variational guides (`inference/flows.py`). No reference counterpart
    (reference `adev/primitives.py` stops at the fixed-form reparam
    strategies)."""

    transform: Callable[..., Any] = Pytree.static()
    eps_shape: tuple = Pytree.static(default=())

    def sample(self, key, *args):
        return self.transform(jax.random.normal(key, self.eps_shape), *args)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        primals = tuple(Dual.tree_primal(dual_tree))
        tangents = tuple(Dual.tree_tangent(dual_tree))
        _, k_eps = jax.random.split(key)
        eps = jax.random.normal(k_eps, self.eps_shape)
        # The noise is fixed; the whole transform's JVP is the pathwise
        # derivative (JAX differentiates through T's body).
        value, d_value = jax.jvp(
            lambda *a: self.transform(eps, *a), primals, tangents
        )
        return Dual(value, d_value)


def pushforward_reparam(transform, eps_shape=()) -> PushforwardREPARAM:
    """Pathwise-gradient primitive for `v = transform(eps, *args)`,
    `eps ~ N(0, I)` of shape `eps_shape`."""
    return PushforwardREPARAM(transform, tuple(eps_shape))


@Pytree.dataclass
class MvNormalDiagREPARAM(TailCallADEVPrimitive):
    def sample(self, key, *args):
        loc, scale_diag = args
        return loc + scale_diag * jax.random.normal(key, shape=loc.shape)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        (loc, scale) = Dual.tree_primal(dual_tree)
        (loc_dot, scale_dot) = Dual.tree_tangent(dual_tree)
        _, k_eps = jax.random.split(key)
        eps = jax.random.normal(k_eps, shape=loc.shape)
        # Componentwise affine in (loc, scale): v̇ = l̇oc + ṡcale·ε.
        return Dual(loc + scale * eps, loc_dot + scale_dot * eps)


mv_normal_diag_reparam = MvNormalDiagREPARAM()


@Pytree.dataclass
class MvNormalREPARAM(TailCallADEVPrimitive):
    """Full-covariance reparameterization via Cholesky."""

    def sample(self, key, *args):
        mu, cov = args
        return jax.random.multivariate_normal(key, mu, cov)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        (mu, cov) = Dual.tree_primal(dual_tree)
        (mu_dot, cov_dot) = Dual.tree_tangent(dual_tree)
        _, k_eps = jax.random.split(key)
        eps = jax.random.normal(k_eps, shape=mu.shape)
        # v = μ + chol(Σ)·ε; the Cholesky factor's derivative rides JAX's
        # built-in JVP rule for `cholesky`.
        value, d_value = jax.jvp(
            lambda m, c: m + jnp.linalg.cholesky(c) @ eps,
            (mu, cov),
            (mu_dot, cov_dot),
        )
        return Dual(value, d_value)


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
class GammaIMPLICIT(TailCallADEVPrimitive):
    """Implicit reparameterization for Gamma(concentration, rate) draws.

    JAX's `jax.random.gamma` carries the Figurnov et al. (2018) implicit
    pathwise derivative w.r.t. the concentration as a built-in custom
    JVP, so the dual propagates through it directly; the rate enters as
    an explicit 1/rate scaling. New relative to the reference (which
    ships only BetaIMPLICIT)."""

    def sample(self, key, *args):
        concentration, rate = args
        return jax.random.gamma(key, concentration) / rate

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        (c_primal, r_primal) = Dual.tree_primal(dual_tree)
        (c_tangent, r_tangent) = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        g, dg = jax.jvp(
            lambda a: jax.random.gamma(sub_key, a), (c_primal,), (c_tangent,)
        )
        v = g / r_primal
        dv = dg / r_primal - g / (r_primal * r_primal) * r_tangent
        return Dual(v, dv)


gamma_implicit = GammaIMPLICIT()


@Pytree.dataclass
class DirichletIMPLICIT(TailCallADEVPrimitive):
    """Implicit reparameterization for Dirichlet(alpha) draws: the dual
    propagates through `jax.random.dirichlet`'s gamma-based sampler,
    whose per-component gammas carry implicit pathwise derivatives. New
    relative to the reference."""

    def sample(self, key, *args):
        (alpha,) = args
        return jax.random.dirichlet(key, alpha)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> Dual:
        (a_primal,) = Dual.tree_primal(dual_tree)
        (a_tangent,) = Dual.tree_tangent(dual_tree)
        key, sub_key = jax.random.split(key)
        v, dv = jax.jvp(
            lambda a: jax.random.dirichlet(sub_key, a), (a_primal,), (a_tangent,)
        )
        return Dual(v, dv)


dirichlet_implicit = DirichletIMPLICIT()


@Pytree.dataclass
class Baseline(ADEVPrimitive):
    """Variance reduction: subtract a baseline `b` from the continuation
    value inside the wrapped strategy, then add it back outside."""

    prim: ADEVPrimitive

    def sample(self, key, *args):
        return self.prim.sample(key, *args[1:])

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (kpure, kdual) = konts
        (b, *inner_primals) = Dual.tree_primal(dual_tree)
        (b_dot, *inner_tangents) = Dual.tree_tangent(dual_tree)

        # Wrap both continuations so the inner strategy sees L - b (the
        # shift is affine, so dual arithmetic is exact: subtract b from the
        # primal and ḃ from the tangent); add the same shift back onto the
        # strategy's output. E[L - b] + b == E[L], but the score term's
        # variance scales with (L - b) instead of L.
        def centered_kdual(k, dual):
            ret = kdual(k, dual)
            return Dual(ret.primal - b, ret.tangent - b_dot)

        def centered_kpure(k, *args):
            return kpure(k, *args) - b

        centered = self.prim.jvp_estimate(
            key,
            Dual.dual_tree(inner_primals, inner_tangents),
            (centered_kpure, centered_kdual),
        )
        return Dual(centered.primal + b, centered.tangent + b_dot)

    def get_batched_prim(self, dims: tuple, size: int) -> ADEVPrimitive:
        key_dim, _b_dim, *arg_dims = dims
        if isinstance(self.prim, REINFORCE):
            # Per-site baselines enter the batched score term directly.
            return BatchedREINFORCE(self.prim, True, dims, size)
        # For enumeration / MVD / reparameterization strategies the
        # baseline shift cancels identically (their probability terms sum
        # difference-of-branches or Σ dπ = 0 weights; the primal shift is
        # added back). Delegate to the inner batched strategy and drop the
        # baseline argument.
        inner = self.prim.get_batched_prim((key_dim, *arg_dims), size)
        return _BaselineDropped(inner)


def baseline(prim: ADEVPrimitive) -> Baseline:
    return Baseline(prim)


@Pytree.dataclass
class _BaselineDropped(ADEVPrimitive):
    """Adapter: forward to a batched strategy, ignoring the (provably
    inert) leading baseline argument."""

    inner: ADEVPrimitive

    def sample(self, key, *args):
        return self.inner.sample(key, *args[1:])

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        rest = list(dual_tree)[1:]
        return self.inner.jvp_estimate(key, tuple(rest), konts)


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

    def get_batched_prim(self, dims: tuple, size: int) -> ADEVPrimitive:
        return BatchedAddCost(dims, size)


@Pytree.dataclass
class BatchedAddCost(ADEVPrimitive):
    """`add_cost` over a batch: every site's cost accumulates once."""

    dims: tuple = Pytree.static()
    size: int = Pytree.static()

    def sample(self, key, *args):
        (w,) = args
        return _to_leading_axis(w, self.dims[1], self.size)

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> Dual:
        (_, kdual) = konts
        (w,) = Dual.tree_primal(dual_tree)
        (w_tangent,) = Dual.tree_tangent(dual_tree)
        w = _to_leading_axis(w, self.dims[1], self.size)
        w_tangent = _to_leading_axis(w_tangent, self.dims[1], self.size)
        zero = jnp.zeros((self.size,))
        l_dual = kdual(key, Dual(zero, zero))
        return Dual(jnp.sum(w) + l_dual.primal, jnp.sum(w_tangent) + l_dual.tangent)


def add_cost(w):
    prim = AddCost()
    prim(w)
