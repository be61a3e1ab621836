"""Cookbook: generative functions, traces, and choice maps.

Mirrors the reference cookbook's intro (active/intro.ipynb topics):
defining models with `@gen`, simulating traces, constraining with choice
maps, and scoring.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMapBuilder as C
from genjax_tpu import SelectionBuilder as S
from genjax_tpu import gen, normal, flip


@gen
def model(mu):
    x = normal(mu, 1.0) @ "x"
    is_outlier = flip(0.1) @ "outlier"
    scale = jnp.where(is_outlier, 10.0, 1.0)
    y = normal(x, scale) @ "y"
    return y


def main():
    key = jax.random.key(0)

    # --- simulate: sample a full execution trace ---
    tr = jax.jit(model.simulate)(key, (0.0,))
    chm = tr.get_choices()
    assert "x" in chm and "y" in chm and "outlier" in chm
    assert jnp.isfinite(tr.get_score())

    # --- assess: exact joint density of a full choice map ---
    score, retval = model.assess(chm, (0.0,))
    assert jnp.allclose(score, tr.get_score(), atol=1e-5)

    # --- importance: constrain observations, weight = internal-proposal
    #     importance weight ---
    constraint = C["y"].set(2.0) | C["outlier"].set(False)
    tr2, w = model.importance(key, constraint, (0.0,))
    assert jnp.allclose(tr2.get_choices()["y"], 2.0)

    # --- choice map algebra ---
    filtered = chm.filter(S["x"] | S["y"])
    assert "outlier" not in filtered
    merged = C["a"].set(1.0) | C["b", "c"].set(2.0)
    assert merged["b", "c"] == 2.0

    # --- update: move a trace to new constraints, weight = density ratio ---
    new_tr, w, _, discard = tr.update(key, C["x"].set(1.0))
    assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-5)
    assert jnp.allclose(discard["x"], chm["x"])

    print("intro cookbook OK")


if __name__ == "__main__":
    main()
