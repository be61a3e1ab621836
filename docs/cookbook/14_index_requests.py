"""Cookbook: O(1) structured edits with `IndexRequest`.

Mirrors the reference cookbook's inactive/update/4_index_request.ipynb:
editing ONE step of a scanned model (or one lane of a vmapped model)
without touching the rest of the sequence — the machinery behind
single-site Metropolis-within-Gibbs on state-space models.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap, Diff, IndexRequest, Regenerate, Selection, Update
from genjax_tpu import gen, normal


def main():
    key = jax.random.key(0)
    T = 16

    # A Gaussian random walk written as a scanned kernel.
    @gen
    def step(carry, _x):
        z = normal(carry, 1.0) @ "z"
        return z, z

    walk = step.scan(n=T)
    tr = walk.simulate(key, (0.0, None))
    zs = tr.get_choices()["z"]
    assert zs.shape == (T,)

    # --- Update one step ------------------------------------------------------
    # IndexRequest(idx, sub_request) applies the sub-request at step idx,
    # then revisits only step idx+1 (whose carry-in changed). Cost is
    # O(1) in T, not a re-scan.
    req = IndexRequest(jnp.array(5), Update(ChoiceMap.kw(z=0.0)))
    new_tr, w, _, bwd = req.edit(
        jax.random.key(1), tr, Diff.no_change((0.0, None))
    )
    new_zs = new_tr.get_choices()["z"]
    assert jnp.allclose(new_zs[5], 0.0)
    untouched = jnp.arange(T) != 5
    assert jnp.allclose(new_zs[untouched], zs[untouched])
    # The weight is the exact joint-density delta:
    assert jnp.allclose(
        w, new_tr.get_score() - tr.get_score(), atol=1e-4
    )
    # ... and the backward request undoes the move:
    back_tr, w_back, _, _ = bwd.edit(
        jax.random.key(2), new_tr, Diff.no_change((0.0, None))
    )
    assert jnp.allclose(back_tr.get_choices()["z"], zs, atol=1e-6)
    assert jnp.allclose(w + w_back, 0.0, atol=1e-4)

    # --- Regenerate one step: single-site MH ---------------------------------
    # The same request algebra carries Regenerate, giving a proposal for
    # Metropolis-within-Gibbs over sites. One sweep:
    def mh_site(carry, idx):
        tr, key = carry
        key, k_prop, k_acc = jax.random.split(key, 3)
        req = IndexRequest(idx, Regenerate(Selection.at["z"]))
        prop_tr, alpha, _, _ = req.edit(k_prop, tr, Diff.no_change((0.0, None)))
        accept = jnp.log(jax.random.uniform(k_acc)) < alpha
        tr = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), prop_tr, tr
        )
        return (tr, key), accept

    (tr_swept, _), accepts = jax.lax.scan(
        mh_site, (tr, jax.random.key(3)), jnp.arange(T)
    )
    # Chain stays on the exact joint: recompute the score from scratch.
    z_after = tr_swept.get_choices()["z"]
    score_check, _ = walk.assess(ChoiceMap.kw(z=z_after), (0.0, None))
    assert jnp.allclose(tr_swept.get_score(), score_check, atol=1e-4)

    # --- Vmap lanes work the same way ----------------------------------------
    @gen
    def cell(mu):
        return normal(mu, 1.0) @ "w"

    batched = cell.vmap(in_axes=(0,))
    vtr = batched.simulate(key, (jnp.zeros(8),))
    req = IndexRequest(jnp.array(3), Update(ChoiceMap.kw(w=9.0)))
    new_vtr, w, _, _ = req.edit(
        jax.random.key(4), vtr, Diff.no_change((jnp.zeros(8),))
    )
    assert jnp.allclose(new_vtr.get_choices()[3, "w"], 9.0)
    assert jnp.allclose(w, new_vtr.get_score() - vtr.get_score(), atol=1e-5)

    print("index-request cookbook: all checks passed")


if __name__ == "__main__":
    main()
