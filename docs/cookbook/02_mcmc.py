"""Cookbook: MCMC — Metropolis-Hastings with Regenerate, custom-proposal
Rejuvenate, HMC, MALA, and vectorized chains.

Mirrors the reference cookbook's MCMC notebook (active/mcmc.ipynb
topics), with the chain drivers this framework adds.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Regenerate, Selection, gen, normal
from genjax_tpu.inference.mcmc import mh, mh_chain, run_chains
from genjax_tpu.inference.requests import HMC, MALA, Rejuvenate


@gen
def model():
    mu = normal(0.0, 1.0) @ "mu"
    _ = normal(mu, 1.0) @ "obs"
    return mu


def main():
    key = jax.random.key(0)
    tr, _ = model.importance(key, C.kw(obs=2.0), ())
    # exact posterior: N(1, 1/sqrt(2))

    # --- MH with prior regeneration ---
    final, mus = jax.jit(
        lambda k, t: mh_chain(
            k, t, Regenerate(Selection.at["mu"]), 3000,
            collect=lambda tr: tr.get_choices()["mu"],
        )
    )(jax.random.key(1), tr)
    assert jnp.abs(jnp.mean(mus[500:]) - 1.0) < 0.12

    # --- MH with a random-walk proposal ---
    @gen
    def drift(prev):
        return normal(prev, 0.3) @ "mu"

    req = Rejuvenate(drift, lambda chm: (chm["mu"],))
    new_tr, accepted = mh(jax.random.key(2), tr, req)

    # --- HMC ---
    hmc = HMC(Selection.at["mu"], jnp.asarray(0.3), L=10)
    final, mus = jax.jit(
        lambda k, t: mh_chain(k, t, hmc, 800, collect=lambda tr: tr.get_choices()["mu"])
    )(jax.random.key(3), tr)
    assert jnp.abs(jnp.mean(mus[200:]) - 1.0) < 0.15

    # --- 64 vectorized MALA chains ---
    keys = jax.random.split(jax.random.key(4), 64)
    trs = jax.vmap(lambda k: model.importance(k, C.kw(obs=2.0), ())[0])(keys)
    finals, _ = jax.jit(
        lambda k, t: run_chains(k, t, MALA(Selection.at["mu"], jnp.asarray(0.2)), 200)
    )(jax.random.key(5), trs)
    assert jnp.abs(jnp.mean(finals.get_choices()["mu"]) - 1.0) < 0.2

    print("mcmc cookbook OK")


if __name__ == "__main__":
    main()
