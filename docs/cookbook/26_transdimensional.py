"""Cookbook: programmable MCMC moves — involutions and reversible
jumps.

Two kernels most PPLs can't express and Gen can:

- **Involutive MH** (`inference.involutive`): write a deterministic,
  differentiable involution on (state, auxiliary randomness); the
  framework supplies the Jacobian correction automatically. Random
  walks, reflections, swaps, multiplicative scalings — each is a
  few-line involution.
- **Reversible jump** (`inference.rjmcmc`): a matched pair of directed
  proposals ACROSS Switch branches of different dimension. The Update
  weight carries the joint-density ratio (index site + new branch's
  priors included); you supply the dimension-matching bijection.
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import ChoiceMapBuilder as CMB
from genjax_tpu import Regenerate, Selection as S, gen, flip, normal, switch
from genjax_tpu.inference.involutive import involutive_mh
from genjax_tpu.inference.mcmc import mh
from genjax_tpu.inference.rjmcmc import JumpProposal, reversible_jump


def main():
    # --- 1. a multiplicative random walk as an involution ---
    # Positive-valued latent: proposals should scale, not shift. The
    # involution (x, u) -> (x e^u, -u) has |det| = e^u — computed for
    # you by jacfwd + slogdet; forget it by hand and the sampler is
    # silently biased (see tests/inference/test_involutive.py).
    @gen
    def lognormal_model():
        x = genjax.log_normal(0.0, 1.0) @ "x"
        _ = normal(jnp.log(x), 1.0) @ "y"

    @gen
    def aux_scale():
        _ = normal(0.0, 0.6) @ "u"

    def scale_move(x_chm, u_chm):
        x2 = jtu.tree_map(lambda x: x * jnp.exp(u_chm["u"]), x_chm)
        return x2, jtu.tree_map(lambda u: -u, u_chm)

    tr, _ = lognormal_model.importance(
        jax.random.key(0), C.kw(y=2.0), ()
    )

    def ichain(t, k):
        t, _ = involutive_mh(k, t, S.at["x"], aux_scale, scale_move)
        return t, jnp.log(t.get_choices()["x"])

    _, zs = jax.jit(
        lambda k, t: jax.lax.scan(ichain, t, jax.random.split(k, 6000))
    )(jax.random.key(1), tr)
    # posterior of log x: N(1, 1/sqrt(2))
    assert abs(float(jnp.mean(zs[1500:])) - 1.0) < 0.12

    # --- 2. reversible jump: one mean or two? ---
    n, sig = 4, 0.5
    rng = np.random.default_rng(1)
    ys1 = jnp.asarray(0.35 + sig * rng.standard_normal(n), dtype=jnp.float32)
    ys2 = jnp.asarray(-0.35 + sig * rng.standard_normal(n), dtype=jnp.float32)

    @gen
    def shared():
        mu = normal(0.0, 1.0) @ "mu"
        return (mu, mu)

    @gen
    def separate():
        mu1 = normal(0.0, 1.0) @ "mu1"
        mu2 = normal(0.0, 1.0) @ "mu2"
        return (mu1, mu2)

    @gen
    def model(ys1, ys2):
        m = flip(0.5) @ "m"
        means = switch(shared, separate)(m.astype(jnp.int32), (), ()) @ "k"
        _ = normal(means[0] * jnp.ones(n), sig) @ "y1"
        _ = normal(means[1] * jnp.ones(n), sig) @ "y2"

    @gen
    def aux_up():  # pads dim 1 -> 2
        _ = normal(0.0, 0.7) @ "u"

    @gen
    def aux_down():  # dim 2 -> 1 needs no padding
        return 0.0

    up = JumpProposal(
        read=lambda chm: chm["k", "mu"].unmask(0.0),
        aux=aux_up,
        involution=lambda mu, u: ((mu + u["u"], mu - u["u"]), C.empty()),
        constraint=lambda p: CMB["m"].set(True)
        | CMB["k", "mu1"].set(p[0])
        | CMB["k", "mu2"].set(p[1]),
    )
    down = JumpProposal(
        read=lambda chm: (
            chm["k", "mu1"].unmask(0.0),
            chm["k", "mu2"].unmask(0.0),
        ),
        aux=aux_down,
        involution=lambda p, u: (
            (p[0] + p[1]) / 2.0,
            C.kw(u=(p[0] - p[1]) / 2.0),
        ),
        constraint=lambda mu: CMB["m"].set(False) | CMB["k", "mu"].set(mu),
    )

    tr, _ = model.importance(
        jax.random.key(2), C.kw(y1=ys1, y2=ys2), (ys1, ys2)
    )

    def sweep(t, k):
        k1, k2 = jax.random.split(k)
        t, _ = reversible_jump(k1, t, up, down, lambda chm: ~chm["m"])
        t, _ = mh(k2, t, Regenerate(S.at["k", ...]))  # within-model move
        return t, t.get_choices()["m"]

    _, ms = jax.jit(
        lambda k, t: jax.lax.scan(sweep, t, jax.random.split(k, 12000))
    )(jax.random.key(3), tr)
    occupancy = float(jnp.mean(ms[3000:]))
    # exact P(m=1 | y) = 0.512 for this dataset (mvn-evidence oracle,
    # tests/inference/test_rjmcmc.py)
    assert abs(occupancy - 0.512) < 0.06
    print(f"ch26 ok: P(two means | y) = {occupancy:.3f} (exact 0.512)")


if __name__ == "__main__":
    main()
