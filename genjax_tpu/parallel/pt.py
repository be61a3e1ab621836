"""Sharded parallel tempering: the replica ladder spans the device mesh.

Extends `inference.parallel_tempering` (beyond the reference — SURVEY.md
§2.2 P4 lists no cross-device inference at all) to meshes: each device
holds `T / n_devices` replicas and advances them with the same vmapped
tempered-MH sweep as the dense path.

The communication story is the point of the design. Replica STATE never
crosses a device boundary — exchanges migrate only the rung->replica
permutation, which every device recomputes identically from a replicated
key. The one true collective per sweep is an `all_gather` of the
(T,)-float log-likelihood vector (plus, when collecting, the small
per-replica statistic), so a sweep's ICI traffic is O(T) scalars no
matter how many megabytes each replica's trace holds. Contrast with a
state-swapping layout, which would move whole traces over ICI every
sweep.

Bit-exactness: key derivation matches `ParallelTempering.run` exactly
(one `split(k_move, T)` fan-out, one replicated `k_swap`), so the
sharded run equals the dense run to the bit — asserted by
tests/parallel/test_sharded_pt.py on the 8-device mesh.
"""

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from genjax_tpu.core.typing import PRNGKey
from genjax_tpu.inference.mcmc import _chain_axes
from genjax_tpu.inference.parallel_tempering import (
    ParallelTempering,
    PTResult,
    tempered_mh,
)
from genjax_tpu.inference.sp import Target

__all__ = ["sharded_pt_run"]


def sharded_pt_run(
    key: PRNGKey,
    pt: ParallelTempering,
    target: Target,
    n_sweeps: int,
    mesh: Mesh,
    axis: str = "replicas",
    collect: Callable[[Any], Any] | None = None,
    init_constraint=None,
) -> PTResult:
    """Run `pt` with its replica axis sharded over `mesh[axis]`.

    Same semantics and PRNG stream as `pt.run` (bit-identical results);
    the returned `PTResult.traces` keep the replica axis sharded.
    """
    n = pt.betas.shape[0]
    n_dev = mesh.shape[axis]
    if n % n_dev != 0:
        raise ValueError(
            f"replica count {n} must divide evenly over the {n_dev} devices "
            f"of mesh axis {axis!r}."
        )
    betas = jnp.asarray(pt.betas)
    obs_sel = target.constraint.get_selection()

    k_init, k_run = jax.random.split(key)
    traces, logliks = pt.init(k_init, target, init_constraint)
    axes = _chain_axes(traces, n)

    # Replica-carrying leaves shard over `axis`; shared-args leaves
    # replicate. Specs are derived from the SAME leading-dim test as the
    # vmap axes tree, so the two can never disagree.
    trace_specs = jtu.tree_map(
        lambda v, ax: P(axis, *([None] * (jnp.ndim(v) - 1)))
        if ax == 0
        else P(),
        traces,
        axes,
    )

    ranks = jnp.arange(n)

    def move(key, trace, loglik, beta):
        req = pt._request_for(beta)
        for m in range(pt.n_moves):
            trace, loglik, _ = tempered_mh(
                jax.random.fold_in(key, m), trace, req, beta, obs_sel, loglik
            )
        return trace, loglik

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), trace_specs, P(axis)),
        out_specs=(trace_specs, P(axis), P(), P(), P(), P()),
        check_vma=False,
    )
    def _run(k_run, traces, logliks):
        n_local = logliks.shape[0]
        block = jax.lax.axis_index(axis) * n_local

        def sweep(carry, scanned):
            traces, ll_local, perm = carry
            sweep_key, parity = scanned
            k_move, k_swap = jax.random.split(sweep_key)

            beta_by_replica = jnp.zeros(n).at[perm].set(betas)
            local_betas = jax.lax.dynamic_slice(
                beta_by_replica, (block,), (n_local,)
            )
            # Same T-way key fan-out as the dense path, sliced locally.
            move_keys = jax.lax.dynamic_slice_in_dim(
                jax.random.split(k_move, n), block, n_local
            )
            traces, ll_local = jax.vmap(
                move, in_axes=(0, axes, 0, 0), out_axes=(axes, 0)
            )(move_keys, traces, ll_local, local_betas)

            # The sweep's only collective: T floats over ICI.
            ll_global = jax.lax.all_gather(ll_local, axis, tiled=True)

            # DEO exchange — replicated scalar work, identical per device.
            ll_rank = ll_global[perm]
            delta = (betas - jnp.roll(betas, -1)) * (
                jnp.roll(ll_rank, -1) - ll_rank
            )
            is_left = (ranks % 2 == parity) & (ranks < n - 1)
            u = jnp.log(jax.random.uniform(k_swap, (n,)))
            acc = is_left & (u < delta)
            acc_prev = jnp.roll(acc, 1).at[0].set(False)
            perm = jnp.where(
                acc,
                jnp.roll(perm, -1),
                jnp.where(acc_prev, jnp.roll(perm, 1), perm),
            )

            if collect is None:
                out = None
            else:
                local = jax.vmap(collect, in_axes=(axes,))(traces)
                gathered = jtu.tree_map(
                    lambda v: jax.lax.all_gather(v, axis, tiled=True), local
                )
                out = jtu.tree_map(lambda v: v[perm[0]], gathered)
            return (traces, ll_local, perm), (out, acc[:-1], is_left[:-1])

        sweep_keys = jax.random.split(k_run, n_sweeps)
        parities = jnp.arange(n_sweeps) % 2
        (traces, ll_local, perm), (collected, accs, attempts) = jax.lax.scan(
            sweep, (traces, logliks, ranks), (sweep_keys, parities)
        )
        n_att = jnp.maximum(jnp.sum(attempts, axis=0), 1)
        swap_rates = jnp.sum(accs, axis=0) / n_att
        return traces, ll_local, perm, collected, swap_rates, n_att

    traces, logliks, perm, collected, swap_rates, _ = _run(
        k_run, traces, logliks
    )
    return PTResult(traces, logliks, perm, collected, swap_rates)
