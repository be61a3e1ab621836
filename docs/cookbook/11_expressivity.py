"""Cookbook: expressivity recipes.

Mirrors the reference cookbook's expressivity set
(inactive/expressivity/{conditionals,masking,iterating_computation,
custom_distribution}.ipynb): stochastic branching with `or_else`/`switch`,
ending computation dynamically with masks, unrolled iteration, and rolling
your own distribution with `exact_density`.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap, gen, normal
from genjax_tpu import ChoiceMapBuilder as C


def main():
    key = jax.random.key(0)

    # --- conditionals: branches are generative functions -------------------
    # JAX forbids Python `if` on traced values; probabilistic branching is
    # expressed with `or_else` (boolean) or `switch` (integer index). Both
    # evaluate every branch under the hood (cheap zero-shape staging picks
    # the live one), so each branch needs its own address namespace.
    @gen
    def spike():
        return normal(0.0, 0.1) @ "spike"

    @gen
    def slab():
        return normal(0.0, 10.0) @ "slab"

    spike_or_slab = genjax.or_else(spike, slab)

    @gen
    def spike_slab_prior(p_spike):
        use_spike = genjax.flip(p_spike) @ "use_spike"
        w = spike_or_slab(use_spike, (), ()) @ "w"
        return w

    tr = spike_slab_prior.simulate(key, (0.9,))
    chm = tr.get_choices()
    # Only the taken branch's choice is valid; the other is masked out.
    taken = chm["w", "spike"] if bool(chm["use_spike"]) else chm["w", "slab"]
    assert bool(taken.primal_flag())

    # switch generalizes to N branches by integer index:
    three_way = genjax.switch(spike, slab, spike)
    tr = three_way.simulate(key, (jnp.array(1), (), (), ()))
    assert bool(tr.get_choices()("slab").get_value().primal_flag())

    # --- masking: dynamic existence -----------------------------------------
    # A model whose structure "ends" at a runtime-determined point keeps a
    # static shape by masking the dead tail. `masked_iterate_final` scans a
    # kernel over a boolean schedule; inactive steps contribute zero score.
    @gen
    def walk_step(x):
        return normal(x, 1.0) @ "z"

    walk = genjax.masked_iterate_final()(walk_step)
    flags = jnp.arange(6) < 3  # walk 3 of a maximum of 6 steps
    tr = walk.simulate(key, (0.0, flags))
    zs = jnp.stack(
        [tr.get_choices()(i)("z").get_value().value for i in range(6)]
    )
    prevs = jnp.concatenate([jnp.array([0.0]), zs[:-1]])
    live_density = jnp.where(
        flags, -0.5 * (zs - prevs) ** 2 - 0.5 * jnp.log(2 * jnp.pi), 0.0
    )
    assert jnp.allclose(tr.get_score(), jnp.sum(live_density), atol=1e-4)

    # The `mask` combinator does the same for a whole submodel: a leading
    # boolean argument gates its score and wraps its value in a Mask.
    gated = spike.mask()
    on = gated.simulate(key, (True,))
    off = gated.simulate(key, (False,))
    assert bool(on.get_retval().primal_flag())
    assert not bool(off.get_retval().primal_flag())
    assert jnp.allclose(off.get_score(), 0.0)

    # --- iterating computation ----------------------------------------------
    # `iterate` composes a kernel x -> x n times, returning all n+1 states
    # (`iterate_final` returns just the last). This is the generative
    # counterpart of `lax.scan` over the kernel's own output.
    @gen
    def noisy_double(x):
        eps = normal(0.0, 1e-3) @ "eps"
        return 2.0 * x + eps

    chain = genjax.iterate(n=4)(noisy_double)
    tr = chain.simulate(key, (1.0,))
    assert tr.get_retval().shape == (5,)
    assert jnp.allclose(tr.get_retval()[-1], 16.0, atol=0.1)

    # --- custom distributions ------------------------------------------------
    # Any (sampler, logpdf) pair becomes a first-class distribution usable
    # at `@ "addr"` — it participates in every GFI method automatically.
    def sample_spike_slab(key, p, scale):
        k1, k2 = jax.random.split(key)
        choose_spike = jax.random.bernoulli(k1, p)
        v = jax.random.normal(k2) * jnp.where(choose_spike, 0.01, scale)
        return v

    def logpdf_spike_slab(v, p, scale):
        lp_spike = -0.5 * (v / 0.01) ** 2 - jnp.log(0.01) - 0.5 * jnp.log(2 * jnp.pi)
        lp_slab = -0.5 * (v / scale) ** 2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)
        return jnp.logaddexp(jnp.log(p) + lp_spike, jnp.log1p(-p) + lp_slab)

    spike_slab = genjax.exact_density(
        sample_spike_slab, logpdf_spike_slab, "spike_slab"
    )

    @gen
    def sparse_model():
        w = spike_slab(0.5, 10.0) @ "w"
        return normal(w, 1.0) @ "y"

    score, _ = sparse_model.assess(ChoiceMap.d({"w": 0.0, "y": 1.0}), ())
    expected = logpdf_spike_slab(0.0, 0.5, 10.0) + (
        -0.5 - 0.5 * jnp.log(2 * jnp.pi)
    )
    assert jnp.allclose(score, expected, atol=1e-5)

    # Custom distributions compose with combinators like any built-in:
    tr, w = sparse_model.repeat(n=3).importance(key, C[1, "y"].set(0.5), ())
    assert tr.get_choices()[1, "y"] == 0.5

    print("expressivity cookbook: all checks passed")


if __name__ == "__main__":
    main()
