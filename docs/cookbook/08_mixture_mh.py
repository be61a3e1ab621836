"""Cookbook: MH over a mixture model's component assignment.

`mix` builds a mixture generative function whose component index is a
traced categorical choice routed into a `Switch`. Because Switch and
Mask accept `Regenerate` edits, a single MH request can propose a
component flip together with a fresh component value — a *block move*.

The one rule to remember: the selection must cover the branch subtree,
not just the index. Under jit the index is dynamic, so regenerating it
always re-simulates the selected branch; if the branch isn't in the
selection, the acceptance ratio misses the fresh branch's proposal
density and the sampler is biased. Spell the subtree with the `...`
wildcard:

    Selection.at["m", "mixture_component"] | Selection.at["m", "component_sample", ...]

(`Selection.at["m", "component_sample"]` alone selects only the callee
level itself — reference LeafSel semantics — and contributes nothing.)
"""

import jax
import jax.numpy as jnp
import jax.scipy.stats as st

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap, Regenerate, Selection, gen, normal
from genjax_tpu.inference.mcmc import run_chains

LOGITS = jnp.array([0.3, -0.2])
MU = jnp.array([0.0, 5.0])
SIG = jnp.array([1.0, 2.0])
OBS_SD = 0.5
Y = 2.5


@gen
def narrow_component():
    return normal(0.0, 1.0) @ "v"


@gen
def wide_component():
    return normal(5.0, 2.0) @ "v"


@gen
def model():
    v = genjax.mix(narrow_component, wide_component)(LOGITS, (), ()) @ "m"
    y = normal(v, OBS_SD) @ "y"
    return y


def main():
    # Initialize 512 chains from the prior conditioned on the observation.
    n_chains, n_steps, burn = 512, 60, 30
    keys = jax.random.split(jax.random.key(0), n_chains)
    traces, _ = jax.vmap(
        lambda k: model.importance(k, ChoiceMap.kw(y=Y), ())
    )(keys)

    # The block move: component index + the whole branch subtree.
    block = Selection.at["m", "mixture_component"] | Selection.at[
        "m", "component_sample", ...
    ]
    collect = lambda tr: tr.get_choices()["m", "mixture_component"]
    _, idxs = jax.jit(
        lambda k, trs: run_chains(k, trs, Regenerate(block), n_steps, collect)
    )(jax.random.key(1), traces)
    p1 = jnp.mean(idxs[:, burn:] == 1)

    # The component posterior has a closed form (v integrates out).
    prior = jax.nn.softmax(LOGITS)
    like = st.norm.pdf(Y, MU, jnp.sqrt(SIG**2 + OBS_SD**2))
    exact = (prior * like)[1] / jnp.sum(prior * like)
    print(f"MH P(c=1|y) = {float(p1):.3f}   closed form = {float(exact):.3f}")
    assert abs(float(p1) - float(exact)) < 0.05


if __name__ == "__main__":
    main()
