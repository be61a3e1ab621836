"""Cookbook: incremental edits compile to O(affected) programs.

The reference demonstrates incremental-edit speedups in a notebook
(cookbook/inactive/update/3_speed_gains.ipynb); here the effect is
visible directly in the compiled program: updating one address of a
many-address model produces a compiled edit that contains no density
work for the untouched addresses (site-graph analysis,
`genjax_tpu/lang/analysis.py`).
"""

import jax
import jax.numpy as jnp

import genjax_tpu as g
from genjax_tpu import ChoiceMap

N = 100


@g.gen
def big_model():
    total = 0.0
    for i in range(N):
        total += g.normal(0.0, 1.0) @ f"x{i}"
    return total


def main():
    tr = big_model.simulate(jax.random.key(0), ())

    # one-address update
    one = jax.jit(lambda k, t: t.update(k, ChoiceMap.kw(x7=1.0))[1])
    hlo_one = one.lower(jax.random.key(1), tr).compile().as_text()

    # full re-score for comparison
    full = jax.jit(lambda t: big_model.assess(t.get_choices(), ())[0])
    hlo_full = full.lower(tr).compile().as_text()

    n_one = len(hlo_one.splitlines())
    n_full = len(hlo_full.splitlines())
    print(f"compiled HLO: 1-address update = {n_one} lines, "
          f"full re-score = {n_full} lines")
    assert n_one * 4 < n_full  # the edit program is dramatically smaller

    # ...and the weight algebra is exactly the dense-recompute answer:
    new_tr, w, _, _ = tr.update(jax.random.key(1), ChoiceMap.kw(x7=1.0))
    assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)
    # untouched subtraces are reused by identity (zero copies):
    assert new_tr.get_subtrace("x3") is tr.get_subtrace("x3")

    print("incremental speed cookbook OK")


if __name__ == "__main__":
    main()
