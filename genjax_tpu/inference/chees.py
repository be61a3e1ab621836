"""ChEES-HMC: automatic trajectory-length adaptation across a chain batch.

Beyond the reference (which ships fixed-(eps, L) HMC only). This is the
accelerator-native answer to NUTS (which is also available:
`inference.requests.NUTS`, in a static-budget SIMD formulation): NUTS
builds a per-chain,
data-dependent trajectory tree, so a SIMD batch of chains pads every
step to the deepest tree and wastes most of its FLOPs; ChEES-HMC
(Hoffman, Radul & Sountsov, AISTATS 2021, "An Adaptive-MCMC Scheme for
Accelerating Inference...") instead adapts ONE shared trajectory length
by gradient ascent on the Change in the Estimator of the Expected
Square criterion

    ChEES(T) = 1/4 * E[ (||q' - mu||^2 - ||q - mu||^2)^2 ],

whose gradient is estimable from the chain batch itself: per chain,
d/dt ||q'(t) - mu||^2 = 2 <q' - mu, M^-1 p'>, so

    grad_i = Delta_i * <q'_i - mu, M^-1 p'_i> * t,   (t = u * T, log-space)

averaged over chains weighted by their acceptance probabilities. Every
iteration draws one shared jitter u ~ U(0, 1) and integrates all chains
for L = ceil(u * T / eps) leapfrog steps — a `lax.fori_loop` with a
TRACED bound, so no recompilation as T adapts and every chain does the
same work each step (perfect SIMD utilization). Step size co-adapts by
dual averaging toward the 0.651 target of the paper; the mass matrix
comes from the cross-chain variance as in `inference.adaptation`.

Validity: (u, L) are drawn independently of the chain state each
iteration, so each iteration is a valid jittered-HMC MH kernel; the
same kernel (with frozen parameters) is used for sampling
(`run_chees_chains`), so the adapted T is optimal for exactly the
kernel that gets run.
"""

from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.random as jrand
import jax.tree_util as jtu

from genjax_tpu.core.choice_map import Selection
from genjax_tpu.core.diff import Diff
from genjax_tpu.core.gfi import Trace, Update
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.staging import where_tree
from genjax_tpu.core.typing import FloatArray, PRNGKey
from genjax_tpu.inference.adaptation import (
    DualAveragingState,
    cross_chain_inv_mass,
    da_final,
    da_init,
    da_update,
)
from genjax_tpu.inference.mcmc import _chain_axes
from genjax_tpu.inference.requests.hmc import (
    _mass_tree,
    assess_momenta,
    make_selection_grad_fn,
    sample_momenta,
)

__all__ = ["ChEESResult", "chees_warmup", "run_chees_chains"]


def _leapfrog_n(grad_fn, values, grads, momenta, im, eps, n_steps):
    """`n_steps` (a traced scalar) leapfrog steps — `fori_loop` lowers to
    a dynamic-bound while loop, so T adaptation never recompiles."""

    def body(_, carry):
        v, g, m = carry
        m = jtu.tree_map(lambda m_, g_: m_ + (eps / 2) * g_, m, g)
        v = jtu.tree_map(lambda v_, m_, im_: v_ + eps * im_ * m_, v, m, im)
        _, g = grad_fn(v)
        m = jtu.tree_map(lambda m_, g_: m_ + (eps / 2) * g_, m, g)
        return (v, g, m)

    return jax.lax.fori_loop(0, n_steps, body, (values, grads, momenta))


def _hmc_step_collecting(key, tr, selection, eps, n_steps, inv_mass):
    """One jittered-HMC step on one chain; returns the updated trace plus
    the (accept_prob, q_start, q_end, p_end) the ChEES gradient needs."""
    argdiffs = Diff.no_change(tr.get_args())
    grad_fn = make_selection_grad_fn(selection, tr, argdiffs)
    values = tr.get_choices().filter(selection)
    _, grads = grad_fn(values)
    k_mom, k_upd, k_acc = jrand.split(key, 3)
    momenta, mscore0 = sample_momenta(k_mom, grads, inv_mass=inv_mass)
    im = _mass_tree(inv_mass, grads)
    v_f, _, m_f = _leapfrog_n(grad_fn, values, grads, momenta, im, eps, n_steps)
    new_tr, _, _, _ = Update(v_f).edit(k_upd, tr, argdiffs)
    mscore1 = assess_momenta(m_f, mul=-1.0, inv_mass=inv_mass)
    alpha = new_tr.get_score() - tr.get_score() + mscore1 - mscore0
    accept = jnp.log(jrand.uniform(k_acc)) < alpha
    prob = jnp.where(jnp.isnan(alpha), 0.0, jnp.exp(jnp.minimum(alpha, 0.0)))
    out_tr = where_tree(accept, new_tr, tr)
    return out_tr, (prob, values, v_f, m_f)


def _batch_sq_dist(q, mu):
    """Per-chain ||q - mu||^2 over all selected leaves: (K,) array."""
    parts = jtu.tree_leaves(
        jtu.tree_map(
            lambda a, b: jnp.sum(
                jnp.square(a - b[None]).reshape(a.shape[0], -1), axis=1
            )
            if jnp.ndim(a) >= 1
            else jnp.zeros(()),
            q,
            mu,
        )
    )
    return sum(parts)


def _batch_dot(a, mu, b, im):
    """Per-chain <a - mu, im * b> over all selected leaves: (K,)."""
    parts = jtu.tree_leaves(
        jtu.tree_map(
            lambda x, m, y, s: jnp.sum(
                ((x - m[None]) * (s[None] * y)).reshape(x.shape[0], -1),
                axis=1,
            ),
            a,
            mu,
            b,
            im,
        )
    )
    return sum(parts)


def _chees_grad_logT(probs, q0, q1, p1, inv_mass, traj_t):
    """Acceptance-weighted estimate of d ChEES / d log T from the batch.

    Diverged trajectories carry inf/nan endpoints with acceptance
    probability 0 — but 0 * inf is nan, so non-finite per-chain terms
    must be zeroed EXPLICITLY or one divergence poisons the Adam state
    for the rest of the warmup."""
    zeros = jtu.tree_map(lambda v: jnp.zeros_like(v[0]), q1)
    finite_mask = jnp.isfinite(_batch_sq_dist(q1, zeros))
    safe_q1 = jtu.tree_map(
        lambda v: jnp.where(
            jnp.reshape(finite_mask, (-1,) + (1,) * (v.ndim - 1)), v, 0.0
        ),
        q1,
    )
    mu = jtu.tree_map(lambda v: jnp.mean(v, axis=0), safe_q1)
    delta = _batch_sq_dist(safe_q1, mu) - _batch_sq_dist(q0, mu)
    im = _mass_tree(inv_mass, mu)
    ddt = _batch_dot(safe_q1, mu, p1, im)
    per_chain = delta * ddt
    w = jnp.where(finite_mask, probs, 0.0)
    w = w / (jnp.sum(w) + 1e-12)
    per_chain = jnp.where(jnp.isfinite(per_chain), per_chain, 0.0)
    grad = jnp.sum(w * per_chain) * traj_t
    return jnp.where(jnp.isfinite(grad), grad, 0.0)


@Pytree.dataclass
class _Adam(Pytree):
    m: FloatArray
    v: FloatArray
    count: FloatArray

    @staticmethod
    def init():
        z = jnp.zeros(())
        return _Adam(z, z, z)

    def step(self, grad, lr=0.05, b1=0.9, b2=0.999, eps=1e-8):
        c = self.count + 1.0
        m = b1 * self.m + (1 - b1) * grad
        v = b2 * self.v + (1 - b2) * grad**2
        mhat = m / (1 - b1**c)
        vhat = v / (1 - b2**c)
        return _Adam(m, v, c), lr * mhat / (jnp.sqrt(vhat) + eps)


@Pytree.dataclass
class ChEESResult(Pytree):
    """Tuned kernel: run with `run_chees_chains(..., result, ...)` (or
    build an `HMC` with `L ~ trajectory_length / (2 * eps)` if a fixed-L
    kernel is preferred)."""

    eps: FloatArray
    trajectory_length: FloatArray
    inv_mass: Any
    accept_rate: FloatArray


def _chees_phase(
    key, traces, axes, n_chains, selection, inv_mass, da, logT, adam,
    n_steps, target, max_leapfrog,
):
    def step(carry, step_key):
        traces, da, logT, adam = carry
        eps = jnp.exp(da.log_eps)
        k_u, k_chains = jrand.split(step_key)
        u = jrand.uniform(k_u)
        traj_t = u * jnp.exp(logT)
        n_leap = jnp.clip(
            jnp.ceil(traj_t / eps).astype(jnp.int32), 1, max_leapfrog
        )
        keys = jrand.split(k_chains, n_chains)
        traces, (probs, q0, q1, p1) = jax.vmap(
            lambda k, tr: _hmc_step_collecting(
                k, tr, selection, eps, n_leap, inv_mass
            ),
            in_axes=(0, axes),
            out_axes=(axes, (0, 0, 0, 0)),
        )(keys, traces)
        grad = _chees_grad_logT(probs, q0, q1, p1, inv_mass, traj_t)
        adam, delta = adam.step(grad)
        logT = jnp.clip(logT + delta, jnp.log(1e-2), jnp.log(1e3))
        mean_prob = jnp.mean(probs)
        da = da_update(da, mean_prob, target=target)
        return (traces, da, logT, adam), mean_prob

    keys = jrand.split(key, n_steps)
    (traces, da, logT, adam), accept_hist = jax.lax.scan(
        step, (traces, da, logT, adam), keys
    )
    return traces, da, logT, adam, accept_hist


def chees_warmup(
    key: PRNGKey,
    traces: Trace[Any],
    selection: Selection,
    n_steps: int = 300,
    *,
    eps0: float = 0.1,
    T0: float = 1.0,
    target_accept: float = 0.651,
    adapt_mass: bool = True,
    max_leapfrog: int = 1024,
    n_chains: int | None = None,
) -> tuple[Trace[Any], ChEESResult]:
    """Jointly adapt step size, trajectory length, and (optionally) the
    diagonal mass matrix for a chain batch. Same phase schedule as
    `adaptation.warmup_chains`; `max_leapfrog` caps per-iteration work
    while T is still exploring.

    >>> import jax, jax.numpy as jnp
    >>> import genjax_tpu as gx
    >>> from genjax_tpu.inference.chees import chees_warmup, run_chees_chains
    >>> @gx.gen
    ... def model():
    ...     mu = gx.normal(0.0, 2.0) @ "mu"
    ...     _ = gx.normal(mu, 1.0) @ "obs"
    >>> keys = jax.random.split(jax.random.key(0), 64)
    >>> trs, _ = jax.vmap(lambda k: model.importance(k, gx.ChoiceMap.kw(obs=1.0), ()))(keys)
    >>> warmed, res = chees_warmup(jax.random.key(1), trs, gx.Selection.at["mu"], n_steps=60)
    >>> bool(res.eps > 0), bool(res.trajectory_length > 0)
    (True, True)
    """
    if n_chains is None:
        n_chains = jnp.shape(traces.get_score())[0]
    axes = _chain_axes(traces, n_chains)
    n1 = max(1, int(0.3 * n_steps))
    n3 = max(1, int(0.2 * n_steps))
    n2 = max(1, n_steps - n1 - n3)
    k1, k2, k3 = jrand.split(key, 3)

    da = da_init(eps0)
    logT = jnp.log(jnp.asarray(T0, dtype=jnp.result_type(float)))
    adam = _Adam.init()
    inv_mass = None

    traces, da, logT, adam, _ = _chees_phase(
        k1, traces, axes, n_chains, selection, inv_mass, da, logT, adam,
        n1, target_accept, max_leapfrog,
    )
    if adapt_mass:
        inv_mass = cross_chain_inv_mass(traces, selection, n_chains)
        # New metric: restart the step size; keep T (the criterion's
        # optimum moves less than the stability limit does).
        da = da_init(1.0)
    traces, da, logT, adam, _ = _chees_phase(
        k2, traces, axes, n_chains, selection, inv_mass, da, logT, adam,
        n2, target_accept, max_leapfrog,
    )
    if adapt_mass:
        inv_mass = cross_chain_inv_mass(traces, selection, n_chains)
    traces, da, logT, adam, accept_hist = _chees_phase(
        k3, traces, axes, n_chains, selection, inv_mass, da, logT, adam,
        n3, target_accept, max_leapfrog,
    )
    return traces, ChEESResult(
        eps=da_final(da),
        trajectory_length=jnp.exp(logT),
        inv_mass=inv_mass,
        accept_rate=jnp.mean(accept_hist),
    )


def run_chees_chains(
    key: PRNGKey,
    traces: Trace[Any],
    selection: Selection,
    result: ChEESResult,
    n_steps: int,
    collect: Callable[[Trace[Any]], Any] | None = None,
    max_leapfrog: int = 1024,
    n_chains: int | None = None,
):
    """Sample with the tuned jittered-HMC kernel (the exact kernel the
    warmup optimized): each iteration draws one shared u ~ U(0,1) and
    integrates every chain for ceil(u * T / eps) steps."""
    if n_chains is None:
        n_chains = jnp.shape(traces.get_score())[0]
    axes = _chain_axes(traces, n_chains)
    eps, T, inv_mass = result.eps, result.trajectory_length, result.inv_mass

    def step(traces, step_key):
        k_u, k_chains = jrand.split(step_key)
        u = jrand.uniform(k_u)
        n_leap = jnp.clip(
            jnp.ceil(u * T / eps).astype(jnp.int32), 1, max_leapfrog
        )
        keys = jrand.split(k_chains, n_chains)
        traces, (probs, _, _, _) = jax.vmap(
            lambda k, tr: _hmc_step_collecting(
                k, tr, selection, eps, n_leap, inv_mass
            ),
            in_axes=(0, axes),
            out_axes=(axes, (0, 0, 0, 0)),
        )(keys, traces)
        out = collect(traces) if collect is not None else jnp.mean(probs)
        return traces, out

    keys = jrand.split(key, n_steps)
    return jax.lax.scan(step, traces, keys)
