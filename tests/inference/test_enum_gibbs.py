"""Generic enumerative Gibbs: the drawn value's distribution equals the
exact full conditional (no conjugacy derivation), and a chain over a
discrete+continuous model converges to the exact marginal."""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as gx
from genjax_tpu import ChoiceMap, Regenerate, Selection
from genjax_tpu.inference.mcmc import enumerative_gibbs, mh


@gx.gen
def two_component():
    z = gx.categorical(jnp.log(jnp.array([0.3, 0.7]))) @ "z"
    _ = gx.normal(jnp.where(z == 0, -1.0, 1.0), 1.0) @ "y"


class TestEnumerativeGibbs:
    def test_single_move_samples_exact_conditional(self):
        y = 0.5
        tr, _ = two_component.importance(
            jax.random.key(0), ChoiceMap.kw(y=y), ()
        )
        l1 = 0.7 * np.exp(-0.5 * (y - 1) ** 2)
        l0 = 0.3 * np.exp(-0.5 * (y + 1) ** 2)
        exact = l1 / (l0 + l1)  # 0.8638
        draws = jax.vmap(
            lambda k: enumerative_gibbs(
                k, tr, "z", jnp.arange(2)
            ).get_choices()["z"]
        )(jax.random.split(jax.random.key(1), 4000))
        se = float(np.sqrt(exact * (1 - exact) / 4000))
        assert abs(float(jnp.mean(draws)) - exact) < 6 * se

    def test_nested_address(self):
        """Gibbs on a discrete site inside a callee (nested address)."""

        @gx.gen
        def inner():
            return gx.categorical(jnp.log(jnp.array([0.3, 0.7]))) @ "z"

        @gx.gen
        def outer():
            z = inner() @ "sub"
            _ = gx.normal(jnp.where(z == 0, -1.0, 1.0), 1.0) @ "y"

        y = 0.5
        tr, _ = outer.importance(jax.random.key(4), ChoiceMap.kw(y=y), ())
        l1 = 0.7 * np.exp(-0.5 * (y - 1) ** 2)
        l0 = 0.3 * np.exp(-0.5 * (y + 1) ** 2)
        exact = l1 / (l0 + l1)
        draws = jax.vmap(
            lambda k: enumerative_gibbs(
                k, tr, ("sub", "z"), jnp.arange(2)
            ).get_choices()["sub", "z"]
        )(jax.random.split(jax.random.key(5), 4000))
        se = float(np.sqrt(exact * (1 - exact) / 4000))
        assert abs(float(jnp.mean(draws)) - exact) < 6 * se

    def test_mixed_gibbs_mh_chain_converges(self):
        """Alternate enumerative Gibbs on the discrete site with MH on a
        continuous one; the discrete marginal matches enumeration."""

        @gx.gen
        def mixed():
            z = gx.categorical(jnp.log(jnp.array([0.5, 0.5]))) @ "z"
            mu = gx.normal(jnp.where(z == 0, -1.0, 1.0), 0.5) @ "mu"
            _ = gx.normal(mu, 0.5) @ "y"

        y = 0.8
        tr, _ = mixed.importance(jax.random.key(2), ChoiceMap.kw(y=y), ())

        def sweep(tr, k):
            k1, k2 = jax.random.split(k)
            tr = enumerative_gibbs(k1, tr, "z", jnp.arange(2))
            tr, _ = mh(k2, tr, Regenerate(Selection.at["mu"]))
            return tr, tr.get_choices()["z"]

        _, zs = jax.lax.scan(
            sweep, tr, jax.random.split(jax.random.key(3), 6000)
        )
        # exact marginal p(z=1 | y): mu integrates out — y | z ~
        # N(+/-1, sqrt(0.5^2 + 0.5^2))
        s2 = 0.5**2 + 0.5**2
        l1 = np.exp(-0.5 * (y - 1) ** 2 / s2)
        l0 = np.exp(-0.5 * (y + 1) ** 2 / s2)
        exact = l1 / (l0 + l1)
        est = float(jnp.mean(zs[1000:]))
        assert abs(est - exact) < 0.05, (est, exact)
