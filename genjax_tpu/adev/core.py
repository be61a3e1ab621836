"""ADEV: automatic differentiation of expected values.

Implements the ADEV algorithm (Lew, Huot, Staton & Mansinghka 2023,
"ADEV: Sound Automatic Differentiation of Expected Values of Probabilistic
Programs") as a continuation-passing forward-mode transform over jaxprs.

Capability parity with reference `_src/adev/core.py:56-519`
(`ADEVPrimitive`, `TailCallADEVPrimitive`, `sample_p`/`sample_primitive`,
`Dual`, the CPS interpreter, `ADEVProgram`, `Expectation`, `expectation`,
`jax.grad` integration via `custom_jvp`).

Design notes
------------
* The interpreter walks the staged loss jaxpr **once per trace** with
  dual numbers; at each `sample_p` equation it packages the remaining
  equations as pure/dual continuations and defers to the primitive's
  gradient strategy (REINFORCE / enumeration / reparameterization / MVD).
  The emitted XLA program is flat — enumeration strategies appear as
  unrolled branch evaluations, reparameterization as plain JVP arithmetic.
* `lax.cond` equations recurse per branch (strategies that call the dual
  continuation multiple times compose correctly with conditionals).
* All other equations use JAX's registered JVP rules (including `jit`
  call equations — covered by `ad.primitive_jvps` in current JAX).
"""

from functools import wraps
from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.interpreters import ad as jax_ad

from genjax_tpu.core.primitives import InitialStylePrimitive, initial_style_bind
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.staging import stage
from genjax_tpu.core.typing import PRNGKey


class ADEVPrimitive(Pytree):
    """A sampler equipped with a JVP gradient-estimation strategy.

    `jvp_estimate(key, dual_tree, (kpure, kdual))` receives dual-number
    arguments and the pure/dual continuations of the remainder of the
    program, and must return a `Dual` estimate of (value, derivative) of
    the expected continuation value.
    """

    def sample(self, key: PRNGKey, *args) -> Any:
        raise NotImplementedError

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> "Dual":
        raise NotImplementedError

    def get_batched_prim(self, dims: tuple, size: int) -> "ADEVPrimitive":
        raise NotImplementedError(
            f"{type(self).__name__} does not support vmap: provide a "
            "batched strategy via get_batched_prim."
        )

    def __call__(self, *args):
        return sample_primitive(self, *args)


class TailCallADEVPrimitive(ADEVPrimitive):
    """Strategies that call the dual continuation exactly once with a dual
    sample (e.g. reparameterization) — only `before_tail_call` is needed."""

    def before_tail_call(self, key: PRNGKey, dual_tree) -> "Dual":
        raise NotImplementedError

    def jvp_estimate(self, key: PRNGKey, dual_tree, konts) -> "Dual":
        _, kdual = konts
        return kdual(key, self.before_tail_call(key, dual_tree))

    def get_batched_prim(self, dims: tuple, size: int) -> "ADEVPrimitive":
        return TailCallBatchedADEVPrimitive(self, dims, size)


@Pytree.dataclass
class TailCallBatchedADEVPrimitive(TailCallADEVPrimitive):
    """A tail-call strategy lifted over a batch axis. `dims` are the batch
    dims of `(key, *args)` at the original (bound) call site; `size` is
    the batch length (needed because the transform's ambient key is
    unbatched and must be split)."""

    original_prim: TailCallADEVPrimitive
    dims: tuple = Pytree.static()
    size: int = Pytree.static()

    def sample(self, key, *args):
        return jax.vmap(self.original_prim.sample, in_axes=self.dims)(key, *args)

    def before_tail_call(self, key: PRNGKey, dual_tree) -> "Dual":
        tree_dims = list(self.dims[1:])
        primals = Dual.tree_primal(dual_tree)
        tangents = Dual.tree_tangent(dual_tree)
        keys = jax.random.split(key, self.size)

        def _inner(key, primals, tangents):
            return self.original_prim.before_tail_call(
                key, Dual.dual_tree(primals, tangents)
            )

        return jax.vmap(_inner, in_axes=(0, tree_dims, tree_dims))(
            keys, list(primals), list(tangents)
        )


##############
# sample_p   #
##############

sample_p = InitialStylePrimitive("adev_sample")


def sample_primitive(adev_prim: ADEVPrimitive, *args, key: PRNGKey | None = None):
    """Bind an ADEV sample point into the current trace. Under plain
    evaluation/jit this just samples; under the ADEV transform the
    equation is intercepted and its gradient strategy engaged.

    The key travels as an explicit bound argument (not a closure const) so
    the batching rule below can vectorize sample sites soundly."""
    if key is None:
        key = jax.random.key(0)

    def _call(adev_prim, key, *args):
        return adev_prim.sample(key, *args)

    return initial_style_bind(sample_p)(_call)(adev_prim, key, *args)


def _sample_batch_rule(batched_args, batch_dims, **params):
    """Batching: rebind `sample_p` with the primitive's batched version so
    the sample point stays visible to the ADEV transform (vmapping the
    inner jaxpr would erase the site and silently break gradient
    strategies)."""
    import jax.tree_util as jtu

    num_consts = params["num_consts"]
    in_tree = params["in_tree"]
    flat_args = list(batched_args[num_consts:])
    flat_dims = list(batch_dims[num_consts:])
    adev_prim, key, *call_args = jtu.tree_unflatten(in_tree, flat_args)
    dims_tree = jtu.tree_unflatten(in_tree, flat_dims)
    _, key_dim, *arg_dims = dims_tree
    size = next(
        a.shape[d]
        for a, d in zip(flat_args, flat_dims)
        if d is not None
    )
    batched_prim = adev_prim.get_batched_prim((key_dim, *arg_dims), size)

    def _call(adev_prim, key, *args):
        return adev_prim.sample(key, *args)

    out = initial_style_bind(sample_p)(_call)(batched_prim, key, *call_args)
    flat_out, _ = jtu.tree_flatten(out)
    return flat_out, [0] * len(flat_out)


from jax.interpreters import batching as _batching  # noqa: E402

_batching.primitive_batchers[sample_p] = _sample_batch_rule


########
# Dual #
########


@Pytree.dataclass
class Dual(Pytree):
    primal: Any
    tangent: Any

    @staticmethod
    def tree_pure(v):
        return jtu.tree_map(
            lambda x: x if isinstance(x, Dual) else Dual(x, jnp.zeros_like(x)),
            v,
            is_leaf=lambda x: isinstance(x, Dual),
        )

    @staticmethod
    def dual_tree(primals, tangents):
        return jtu.tree_map(lambda p, t: Dual(p, t), primals, tangents)

    @staticmethod
    def tree_primal(v):
        return jtu.tree_map(
            lambda x: x.primal if isinstance(x, Dual) else x,
            v,
            is_leaf=lambda x: isinstance(x, Dual),
        )

    @staticmethod
    def tree_tangent(v):
        return jtu.tree_map(
            lambda x: x.tangent if isinstance(x, Dual) else x,
            v,
            is_leaf=lambda x: isinstance(x, Dual),
        )

    @staticmethod
    def tree_leaves(v):
        return jtu.tree_leaves(Dual.tree_pure(v), is_leaf=lambda x: isinstance(x, Dual))

    @staticmethod
    def tree_unzip(v):
        primals = jtu.tree_leaves(Dual.tree_primal(v))
        tangents = jtu.tree_leaves(Dual.tree_tangent(v))
        return tuple(primals), tuple(tangents)


###############################
# CPS forward-mode interpreter #
###############################


# The jaxpr var -> value store shared with other custom interpreters
# (C5; reference `interpreters/environment.py`).
from genjax_tpu.core.environment import Environment as _Env


def _flat_unzip(duals):
    primals = [d.primal for d in duals]
    tangents = [d.tangent for d in duals]
    return primals, tangents


def _eval_eqns_pure(key, eqns, env: _Env, invars, flat_args, outvars):
    """Evaluate remaining eqns without tangents (the pure continuation)."""
    for var, val in zip(invars, flat_args):
        env.write(var, val)
    for eqn in eqns:
        in_vals = [env.read(v) for v in eqn.invars]
        subfuns, params = eqn.primitive.get_bind_params(eqn.params)
        outs = eqn.primitive.bind(*subfuns, *in_vals, **params)
        if not eqn.primitive.multiple_results:
            outs = [outs]
        for var, val in zip(eqn.outvars, outs):
            env.write(var, val)
    return [env.read(v) for v in outvars]


def _jvp_through_bind(primitive, subfuns, params, flat_primals, flat_tangents):
    """JVP of `primitive.bind(*subfuns, *primals, **params)` — the generic
    rule for call-like equations whose JVP lives behind bind dispatch."""
    import numpy as np
    from jax.dtypes import float0

    def _bind(*p):
        return primitive.bind(*subfuns, *p, **params)

    def _as_jvp_tangent(p, t):
        if jnp.issubdtype(jnp.result_type(p), jnp.inexact):
            return jnp.asarray(t, dtype=jnp.result_type(p))
        return np.zeros(jnp.shape(p), dtype=float0)

    tangents_in = tuple(
        _as_jvp_tangent(p, t) for p, t in zip(flat_primals, flat_tangents)
    )
    primal_outs, tangent_outs = jax.jvp(_bind, tuple(flat_primals), tangents_in)
    flat_p, tdef = jtu.tree_flatten(primal_outs)
    flat_t = jtu.tree_leaves(tangent_outs)
    flat_t = [
        jnp.zeros_like(p) if (hasattr(t, "dtype") and t.dtype == float0) else t
        for p, t in zip(flat_p, flat_t)
    ]
    return flat_p, jtu.tree_unflatten(tdef, flat_t)


def _eval_eqns_dual(key, eqns, env: _Env, invars, flat_duals, outvars):
    """CPS dual-number walk: returns the final `Dual` of the single output.

    On `sample_p`, control transfers to the primitive's strategy with the
    remaining equations packaged as continuations; this function then
    *returns* whatever the strategy returns (the strategy owns the rest of
    the computation).
    """
    for var, dual in zip(invars, flat_duals):
        env.write(var, dual)

    for eqn_idx, eqn in enumerate(eqns):
        in_duals = [Dual.tree_pure(env.read(v)) for v in eqn.invars]

        if eqn.primitive is sample_p:
            rest = eqns[eqn_idx + 1 :]
            dual_env = env.copy()
            pure_env = _Env({
                k: Dual.tree_primal(v) for k, v in env.env.items()
            })

            def kpure(key, *args):
                outs = _eval_eqns_pure(
                    key, rest, pure_env.copy(), eqn.outvars, list(args), outvars
                )
                return outs[0] if len(outs) == 1 else outs

            def kdual(key, dual_tree):
                dual_leaves = Dual.tree_leaves(dual_tree)
                return _eval_eqns_dual(
                    key, rest, dual_env.copy(), eqn.outvars, dual_leaves, outvars
                )

            in_tree = eqn.params["in_tree"]
            num_consts = eqn.params["num_consts"]
            flat_primals, flat_tangents = _flat_unzip(
                Dual.tree_leaves(in_duals[num_consts:])
            )
            adev_prim, _site_key, *primals = jtu.tree_unflatten(
                in_tree, flat_primals
            )
            _, _, *tangents = jtu.tree_unflatten(in_tree, flat_tangents)
            dual_tree = Dual.dual_tree(primals, tangents)
            # The interpreter's ambient key drives the strategy (the
            # site-bound key only serves plain evaluation), matching the
            # reference's PRNG discipline under the transform.
            return adev_prim.jvp_estimate(key, dual_tree, (kpure, kdual))

        elif eqn.primitive is jax.lax.cond_p:
            rest = eqns[eqn_idx + 1 :]
            dual_env = env.copy()

            def cond_kdual(out_dual_tree):
                dual_leaves = Dual.tree_leaves(out_dual_tree)
                return _eval_eqns_dual(
                    key, rest, dual_env.copy(), eqn.outvars, dual_leaves, outvars
                )

            from jax.extend.core import jaxpr_as_fun

            branch_fns = [
                forward_mode(jaxpr_as_fun(branch_jaxpr), cond_kdual)
                for branch_jaxpr in eqn.params["branches"]
            ]
            pred = Dual.tree_primal(in_duals[0])
            return jax.lax.cond(
                pred,
                *reversed(branch_fns),
                key,
                in_duals[1:],
            )

        else:
            subfuns, params = eqn.primitive.get_bind_params(eqn.params)
            flat_primals, flat_tangents = _flat_unzip(Dual.tree_leaves(in_duals))
            if len(flat_primals) == 0:
                primal_outs = eqn.primitive.bind(*subfuns, **params)
                tangent_outs = jtu.tree_map(jnp.zeros_like, primal_outs)
            else:
                jvp = None if subfuns else jax_ad.primitive_jvps.get(eqn.primitive)
                if jvp is not None:
                    primal_outs, tangent_outs = jvp(
                        flat_primals, flat_tangents, **params
                    )
                else:
                    # Call-like primitives (custom_jvp_call, custom_vjp_call,
                    # …) carry traced subfunctions; differentiate through a
                    # re-bind with `jax.jvp`, which dispatches to the
                    # primitive's own JVP machinery. Integer/bool primals
                    # take float0 tangents per JAX's JVP calling convention.
                    primal_outs, tangent_outs = _jvp_through_bind(
                        eqn.primitive, subfuns, params, flat_primals, flat_tangents
                    )
            if not eqn.primitive.multiple_results:
                primal_outs = [primal_outs]
                tangent_outs = [tangent_outs]
            for var, p, t in zip(eqn.outvars, primal_outs, tangent_outs):
                t = (
                    jnp.zeros_like(p)
                    if isinstance(t, jax_ad.Zero) or t is None
                    else t
                )
                env.write(var, Dual(p, t))

    (out_dual,) = [env.read(v) for v in outvars]
    if not isinstance(out_dual, Dual):
        out_dual = Dual(out_dual, jnp.zeros_like(out_dual))
    return out_dual


def forward_mode(f: Callable[..., Any], kont=lambda v: v):
    """Build the CPS forward-mode transform of `f` (single scalar output):
    `forward_mode(f)(key, dual_args) -> Dual`."""

    def _dual(key, dual_tree):
        dual_tree = jtu.tree_map(
            lambda v: v if isinstance(v, Dual) else jnp.asarray(v),
            dual_tree,
            is_leaf=lambda v: isinstance(v, Dual),
        )
        primals = jtu.tree_leaves(Dual.tree_primal(dual_tree))
        closed_jaxpr, (_, _, out_tree_thunk) = stage(f)(*primals)
        jaxpr = closed_jaxpr.jaxpr
        consts = closed_jaxpr.literals
        env = _Env()
        for var, const in zip(jaxpr.constvars, consts):
            env.write(var, Dual.tree_pure(const))
        dual_leaves = Dual.tree_leaves(Dual.tree_pure(dual_tree))
        out_dual = _eval_eqns_dual(
            key, jaxpr.eqns, env, jaxpr.invars, dual_leaves, jaxpr.outvars
        )
        out_tree = out_tree_thunk()
        if isinstance(out_dual, Dual):
            result = out_dual
        else:
            # Strategies may return raw (primal, tangent) lists.
            primals, tangents = Dual.tree_unzip(out_dual)
            result = Dual(
                jtu.tree_unflatten(out_tree, list(primals)),
                jtu.tree_unflatten(out_tree, list(tangents)),
            )
        return kont(result)

    return _dual


################
# Expectation  #
################


@Pytree.dataclass
class ADEVProgram(Pytree):
    source: Callable[..., Any] = Pytree.static()

    def jvp_estimate(self, key: PRNGKey, dual_tree, dual_kont) -> Dual:
        @wraps(self.source)
        def wrapped(dual_tree):
            return forward_mode(self.source, dual_kont)(key, dual_tree)

        return wrapped(dual_tree)


@Pytree.dataclass
class Expectation(Pytree):
    """An expectation-valued objective: `E[f(args, randomness)]` with
    unbiased gradient estimation via the strategies at each sample site."""

    prog: ADEVProgram

    def jvp_estimate(self, key: PRNGKey, dual_tree) -> Dual:
        return self.prog.jvp_estimate(key, dual_tree, lambda v: v)

    def estimate(self, key: PRNGKey, args):
        tangents = jtu.tree_map(lambda x: jnp.zeros_like(x, dtype=jnp.result_type(x, jnp.float32)), args)
        return self.jvp_estimate(key, Dual.dual_tree(args, tangents)).primal

    def grad_estimate(self, key: PRNGKey, primals: tuple):
        """Unbiased estimate of the gradient of the expectation w.r.t.
        `primals` (via `jax.grad` over the custom-JVP bridge)."""

        def _invoke(primals):
            return invoke_closed_over(self, key, primals)

        return jax.grad(_invoke)(primals)

    def value_and_grad_estimate(self, key: PRNGKey, primals: tuple):
        def _invoke(primals):
            return invoke_closed_over(self, key, primals)

        return jax.value_and_grad(_invoke)(primals)


def expectation(source: Callable[..., Any]) -> Expectation:
    """Decorator: mark a stochastic program as an expectation-valued
    objective with ADEV gradient estimation.

    >>> import jax
    >>> from genjax_tpu.adev import expectation, flip_enum
    >>> @expectation
    ... def loss(p):
    ...     b = flip_enum(p)
    ...     return jax.lax.cond(b, lambda: 1.0, lambda: 0.0)
    >>> (grad,) = loss.grad_estimate(jax.random.key(0), (0.3,))
    >>> print(round(float(grad), 4))  # E = p, exactly differentiated
    1.0
    """
    return Expectation(ADEVProgram(source))


@jax.custom_jvp
def invoke_closed_over(instance, key, args):
    return instance.estimate(key, args)


def _invoke_closed_over_jvp(primals: tuple, tangents: tuple):
    (instance, key, primals_) = primals
    (_, _, tangents_) = tangents
    duals = Dual.dual_tree(primals_, tangents_)
    out_dual = instance.jvp_estimate(key, duals)
    (v,), (tangent,) = Dual.tree_unzip(out_dual)
    return v, tangent


invoke_closed_over.defjvp(_invoke_closed_over_jvp, symbolic_zeros=False)
