"""MH over a mixture model's component assignment — Regenerate through
the Switch combinator — validated against the closed-form component
posterior.

This is the capability unlocked by Switch/Mask supporting `Regenerate`
(the reference's switch only supports `Update`; reference
`_src/generative_functions/combinators/switch.py`). Note the move must
be a BLOCK move: under jit the switch index is dynamic, so regenerating
it always re-simulates the branch subtree — the selection must cover
the component sample too, or the acceptance ratio misses the fresh
branch's proposal density.
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as st

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Diff, Regenerate, Selection
from genjax_tpu.inference.mcmc import run_chains

MU = jnp.array([0.0, 5.0])
SIG = jnp.array([1.0, 2.0])
LOGITS = jnp.array([0.3, -0.2])
OBS_SD = 0.5
Y = 2.5


@g.gen
def comp_a():
    return g.normal(0.0, 1.0) @ "v"


@g.gen
def comp_b():
    return g.normal(5.0, 2.0) @ "v"


@g.gen
def model():
    v = g.mix(comp_a, comp_b)(LOGITS, (), ()) @ "m"
    y = g.normal(v, OBS_SD) @ "y"
    return y


def exact_posterior_c1():
    """P(c=1 | y): v integrates out in closed form per component."""
    prior = jax.nn.softmax(LOGITS)
    like = st.norm.pdf(Y, MU, jnp.sqrt(SIG**2 + OBS_SD**2))
    post = prior * like
    return post[1] / jnp.sum(post)


# Block selection: the component index AND the whole branch subtree.
# (`Selection.at["m", "component_sample"]` alone would stop at the callee
# level — LeafSel matches only its own level, reference semantics — so the
# `...` wildcard selects everything beneath it. Without the branch subtree
# in the block, the acceptance ratio misses the fresh branch's proposal
# density and the component posterior comes out biased.)
BLOCK = (
    Selection.at["m", "mixture_component"]
    | Selection.at["m", "component_sample", ...]
)


class TestMixtureComponentMH:
    def test_block_regen_weight_is_joint_delta(self):
        tr = model.importance(jax.random.key(0), ChoiceMap.kw(y=Y), ())[0]
        new_tr, w, _, _ = Regenerate(BLOCK).edit(
            jax.random.key(1), tr, Diff.no_change(())
        )
        assert jnp.allclose(w, new_tr.get_score() - tr.get_score(), atol=1e-4)

    def test_posterior_matches_closed_form(self):
        n_chains, n_steps, burn = 2048, 80, 40
        keys = jax.random.split(jax.random.key(0), n_chains)
        traces, _ = jax.vmap(
            lambda k: model.importance(k, ChoiceMap.kw(y=Y), ())
        )(keys)
        collect = lambda tr: tr.get_choices()["m", "mixture_component"]
        _, idxs = jax.jit(
            lambda k, trs: run_chains(
                k, trs, Regenerate(BLOCK), n_steps, collect
            )
        )(jax.random.key(1), traces)
        p1 = jnp.mean(idxs[:, burn:] == 1)
        exact = exact_posterior_c1()
        # ~82k post-burn-in samples across 2048 independent chains
        assert abs(float(p1) - float(exact)) < 0.02, (float(p1), float(exact))
