"""Hamiltonian Monte Carlo and MALA as SMCP3 edit requests.

Capability parity with reference `_src/inference/requests/hmc.py:70-225`
(`selection_gradient`, `HMC` with leapfrog over selected choices,
`SafeHMC`); `MALA` is added (the reference's benchmark configs call for
it, BASELINE.md config 4).

TPU notes
---------
The leapfrog loop is a `lax.scan` whose body is `jax.grad` of the model's
`assess` — one fused density+gradient evaluation per step, dense over the
selected choice leaves. Vectorizing over chains is a `jax.vmap` (or
`shard_map`, see `genjax_tpu.parallel.chains`) around `HMC(...).edit`.
"""

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jrand
import jax.tree_util as jtu
from jax import grad
from jax.lax import scan

from genjax_tpu.core.choice_map import ChoiceMap, Selection
from genjax_tpu.core.concepts import Argdiffs, EditRequest, Retdiff, Score, Weight
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.gfi import Trace, Update
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.requests import DiffAnnotate
from genjax_tpu.core.typing import (
    FloatArray,
    PRNGKey,
    static_check_supports_grad,
)

_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


def grad_tree_unzip(tree):
    grad_tree = jtu.tree_map(lambda v: v if static_check_supports_grad(v) else None, tree)
    nongrad_tree = jtu.tree_map(
        lambda v: v if not static_check_supports_grad(v) else None, tree
    )
    return grad_tree, nongrad_tree


def grad_tree_zip(grad_tree, nongrad_tree):
    return jtu.tree_map(
        lambda v1, v2: v1 if v1 is not None else v2,
        grad_tree,
        nongrad_tree,
        is_leaf=lambda x: x is None,
    )


def make_selection_grad_fn(
    selection: Selection, trace: Trace[Any], argdiffs: Argdiffs
):
    """Build a reusable `values -> (logdensity, gradient)` closure over the
    selected addresses of `trace` (all other choices held fixed).

    Building the closure once and calling it inside `lax.scan` keeps each
    leapfrog step at exactly one fused forward+backward density pass —
    the hand-written-HMC cost."""
    chm = trace.get_choices()
    filtered = chm.filter(selection)
    complement = chm.filter(~selection)
    _, nongrad_tree = grad_tree_unzip(filtered)
    gen_fn = trace.get_gen_fn()
    primal_args = Diff.tree_primal(argdiffs)

    def differentiable_assess(grad_tree):
        zipped = grad_tree_zip(grad_tree, nongrad_tree)
        full_choices = zipped.merge(complement)
        weight, _ = gen_fn.assess(full_choices, primal_args)
        return weight

    value_and_grad_fn = jax.value_and_grad(differentiable_assess)

    def fn(values: ChoiceMap):
        grad_tree, _ = grad_tree_unzip(values)
        score, gradient = value_and_grad_fn(grad_tree)
        gradient = jtu.tree_map(
            lambda v1, v2: v1 if v1 is not None else jnp.zeros_like(jnp.asarray(v2)),
            gradient,
            nongrad_tree,
            is_leaf=lambda x: x is None,
        )
        return score, grad_tree_zip(gradient, nongrad_tree)

    return fn


def selection_gradient(
    selection: Selection, trace: Trace[Any], argdiffs: Argdiffs
) -> tuple[ChoiceMap, ChoiceMap]:
    """Return (selected values, gradient of the model log density w.r.t.
    them), holding all other choices fixed
    (reference `hmc.py:70-110` interface)."""
    chm = trace.get_choices()
    filtered = chm.filter(selection)
    grad_fn = make_selection_grad_fn(selection, trace, argdiffs)
    _, gradient = grad_fn(filtered)
    grad_tree, nongrad_tree = grad_tree_unzip(filtered)
    return grad_tree_zip(grad_tree, nongrad_tree), gradient


def _std_normal_score(v) -> Score:
    s = -0.5 * jnp.square(v) - _HALF_LOG_2PI
    return jnp.sum(s) if jnp.ndim(s) else s


def assess_momenta(momenta, mul=1.0):
    return jnp.sum(
        jnp.array(
            jtu.tree_leaves(jtu.tree_map(lambda v: _std_normal_score(mul * v), momenta))
        )
    )


def sample_momenta(key: PRNGKey, choice_gradients):
    leaves_ct = len(jtu.tree_leaves(choice_gradients))
    seed_tree = jtu.tree_unflatten(
        jtu.tree_structure(choice_gradients), list(range(leaves_ct))
    )
    momenta = jtu.tree_map(
        lambda v, seed: jrand.normal(jrand.fold_in(key, seed), jnp.shape(v)),
        choice_gradients,
        seed_tree,
    )
    return momenta, assess_momenta(momenta)


@Pytree.dataclass(match_args=True)
class HMC(EditRequest):
    """Leapfrog HMC over the selected addresses; the returned weight is the
    HMC alpha (log accept ratio): DH = (new model score + new momenta
    score) - (old model score + old momenta score). Accept/reject is the
    caller's (see `genjax_tpu.inference.mcmc.mh`).

    Neal (2011), eqns (5.18)-(5.20).

    >>> import jax, jax.numpy as jnp
    >>> import genjax_tpu as gx
    >>> from genjax_tpu.inference.requests import HMC
    >>> @gx.gen
    ... def model():
    ...     mu = gx.normal(0.0, 1.0) @ "mu"
    ...     _ = gx.normal(mu, 1.0) @ "obs"
    >>> tr, _ = model.importance(jax.random.key(0), gx.ChoiceMap.kw(obs=1.0), ())
    >>> req = HMC(gx.Selection.at["mu"], jnp.array(0.1), L=5)
    >>> new_tr, alpha, _, _ = req.edit(jax.random.key(1), tr, gx.Diff.no_change(()))
    >>> bool(jnp.isfinite(alpha))
    True
    """

    selection: Selection
    eps: FloatArray
    L: int = Pytree.static(default=10)

    def edit(
        self, key: PRNGKey, tr: Trace[Any], argdiffs: Argdiffs
    ) -> tuple[Trace[Any], Weight, Retdiff, EditRequest]:
        assert Diff.static_check_no_change(argdiffs)
        original_score = tr.get_score()
        grad_fn = make_selection_grad_fn(self.selection, tr, argdiffs)
        values = tr.get_choices().filter(self.selection)
        _, gradients = grad_fn(values)
        key, sub_key = jrand.split(key)
        momenta, original_momenta_score = sample_momenta(sub_key, gradients)

        # Leapfrog over (values, momenta, gradient) with ONE fused
        # forward+backward density pass per step; the trace itself is
        # rebuilt once at the end (a single Update edit), not per step.
        def leapfrog(carry, _):
            values, gradient, momenta = carry
            momenta = jtu.tree_map(lambda m, g: m + (self.eps / 2) * g, momenta, gradient)
            values = jtu.tree_map(lambda v, m: v + self.eps * m, values, momenta)
            _, gradient = grad_fn(values)
            momenta = jtu.tree_map(lambda m, g: m + (self.eps / 2) * g, momenta, gradient)
            return (values, gradient, momenta), None

        (final_values, _, final_momenta), _ = scan(
            leapfrog, (values, gradients, momenta), None, length=self.L
        )
        final_trace, _, retdiff, _ = Update(final_values).edit(key, tr, argdiffs)
        final_momenta_score = assess_momenta(final_momenta, mul=-1.0)
        alpha = (
            final_trace.get_score()
            - original_score
            + final_momenta_score
            - original_momenta_score
        )
        return (
            final_trace,
            alpha,
            retdiff,
            HMC(self.selection, self.eps, self.L),
        )


def SafeHMC(selection: Selection, eps: FloatArray, L: int = 10) -> DiffAnnotate:
    """HMC with a static return-value-stability assertion (reference
    `hmc.py:214-225`): the move is rejected at trace time unless the
    site-graph analysis proves the selected addresses cannot reach the
    model's return value (see `lang/analysis.py`)."""

    def retdiff_assertion(retdiff):
        assert Diff.static_check_no_change(retdiff), (
            "SafeHMC: the selected addresses may change the model's "
            "return value; use HMC directly if this is intended."
        )
        return retdiff

    return HMC(selection, eps, L).map(retdiff_assertion)


@Pytree.dataclass(match_args=True)
class MALA(EditRequest):
    """Metropolis-adjusted Langevin: one gradient step plus noise on the
    selected addresses; the weight is the MALA log accept ratio.

    New relative to the reference (BASELINE.md benchmark config 4 calls
    for MALA chains).
    """

    selection: Selection
    eps: FloatArray

    def edit(
        self, key: PRNGKey, tr: Trace[Any], argdiffs: Argdiffs
    ) -> tuple[Trace[Any], Weight, Retdiff, EditRequest]:
        assert Diff.static_check_no_change(argdiffs)
        eps = self.eps
        grad_fn = make_selection_grad_fn(self.selection, tr, argdiffs)
        values = tr.get_choices().filter(self.selection)
        _, grads = grad_fn(values)
        key, noise_key = jrand.split(key)
        leaves_ct = len(jtu.tree_leaves(values))
        seed_tree = jtu.tree_unflatten(
            jtu.tree_structure(values), list(range(leaves_ct))
        )
        noise = jtu.tree_map(
            lambda v, s: jrand.normal(jrand.fold_in(noise_key, s), jnp.shape(v)),
            values,
            seed_tree,
        )
        proposed = jtu.tree_map(
            lambda v, g, xi: v + eps * g + jnp.sqrt(2.0 * eps) * xi,
            values,
            grads,
            noise,
        )

        def q_score(to_vals, from_vals, from_grads):
            # log q(to | from) under Langevin proposal
            diffs = jtu.tree_map(
                lambda t, f, g: -jnp.sum(jnp.square(t - f - eps * g)) / (4.0 * eps),
                to_vals,
                from_vals,
                from_grads,
            )
            return jnp.sum(jnp.array(jtu.tree_leaves(diffs)))

        fwd_q = q_score(proposed, values, grads)
        new_tr, w, retdiff, _ = Update(proposed).edit(key, tr, argdiffs)
        new_values = new_tr.get_choices().filter(self.selection)
        _, new_grads = grad_fn(new_values)
        bwd_q = q_score(values, new_values, new_grads)
        alpha = w + bwd_q - fwd_q
        return (
            new_tr,
            alpha,
            retdiff,
            MALA(self.selection, self.eps),
        )
