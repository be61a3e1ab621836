"""Involutive MCMC: exact acceptance-ratio identities and conjugate-
posterior convergence (incl. a non-unit-Jacobian move, which fails if
the automatic `slogdet` correction is wrong)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.inference.involutive import involutive_mh, involutive_step


@g.gen
def normal_model():
    x = g.normal(0.0, 1.0) @ "x"
    _ = g.normal(x, 1.0) @ "y"


@g.gen
def aux_walk():
    _ = g.normal(0.0, 0.8) @ "u"


def reflect(x_chm, u_chm):
    # random-walk: (x, u) -> (x + u, -u); involution, |det| = 1
    x2 = jtu.tree_map(lambda x: x + u_chm["u"], x_chm)
    u2 = jtu.tree_map(lambda u: -u, u_chm)
    return x2, u2


def _chain(key, tr, move, n, collect):
    def step(t, k):
        t2, acc = move(k, t)
        return t2, (collect(t2), acc)

    return jax.lax.scan(step, tr, jax.random.split(key, n))


class TestRandomWalkMove:
    def test_converges_to_conjugate_posterior(self):
        tr, _ = normal_model.importance(
            jax.random.key(0), ChoiceMap.kw(y=2.0), ()
        )
        move = lambda k, t: involutive_mh(
            k, t, Selection.at["x"], aux_walk, reflect
        )
        _, (xs, accs) = jax.jit(
            lambda k, t: _chain(k, t, move, 5000, lambda t: t.get_choices()["x"])
        )(jax.random.key(1), tr)
        s = xs[1000:]
        assert jnp.abs(jnp.mean(s) - 1.0) < 0.1  # posterior N(1, 1/2)
        assert jnp.abs(jnp.std(s) - 0.5**0.5) < 0.08
        assert 0.3 < jnp.mean(accs) < 0.95

    def test_identity_involution_always_accepts_unchanged(self):
        tr, _ = normal_model.importance(
            jax.random.key(0), ChoiceMap.kw(y=2.0), ()
        )
        ident = lambda x, u: (x, u)
        new_tr, log_alpha = involutive_step(
            jax.random.key(2), tr, Selection.at["x"], aux_walk, ident
        )
        assert jnp.allclose(log_alpha, 0.0, atol=1e-5)
        assert jnp.allclose(
            new_tr.get_choices()["x"], tr.get_choices()["x"]
        )


@g.gen
def lognormal_model():
    x = g.log_normal(0.0, 1.0) @ "x"
    _ = g.normal(jnp.log(x), 1.0) @ "y"


@g.gen
def aux_scale():
    _ = g.normal(0.0, 0.6) @ "u"


def scale_move(x_chm, u_chm):
    # multiplicative walk: (x, u) -> (x e^u, -u); |det Df| = e^u
    x2 = jtu.tree_map(lambda x: x * jnp.exp(u_chm["u"]), x_chm)
    u2 = jtu.tree_map(lambda u: -u, u_chm)
    return x2, u2


class TestScalingMoveJacobian:
    def test_log_alpha_matches_hand_derivation(self):
        """For the scaling move with symmetric aux density the exact
        ratio is  log alpha = [score(x') - score(x)] + u  (the +u is
        the Jacobian term — this identity fails without slogdet)."""
        tr, _ = lognormal_model.importance(
            jax.random.key(0), ChoiceMap.kw(y=2.0), ()
        )
        new_tr, log_alpha = involutive_step(
            jax.random.key(3), tr, Selection.at["x"], aux_scale, scale_move
        )
        x_old = tr.get_choices()["x"]
        x_new = new_tr.get_choices()["x"]
        u = jnp.log(x_new / x_old)
        s_old, _ = lognormal_model.assess(tr.get_choices(), ())
        s_new, _ = lognormal_model.assess(new_tr.get_choices(), ())
        assert jnp.allclose(log_alpha, s_new - s_old + u, atol=1e-4)

    def test_converges_with_jacobian_correction(self):
        # posterior of log x given y=2: N(1, 1/sqrt(2)); a missing e^u
        # Jacobian factor shifts the stationary mean by ~0.3 — well
        # outside this tolerance.
        tr, _ = lognormal_model.importance(
            jax.random.key(2), ChoiceMap.kw(y=2.0), ()
        )
        move = lambda k, t: involutive_mh(
            k, t, Selection.at["x"], aux_scale, scale_move
        )
        _, (zs, _) = jax.jit(
            lambda k, t: _chain(
                k, t, move, 8000, lambda t: jnp.log(t.get_choices()["x"])
            )
        )(jax.random.key(3), tr)
        s = zs[2000:]
        assert jnp.abs(jnp.mean(s) - 1.0) < 0.12
        assert jnp.abs(jnp.std(s) - 0.5**0.5) < 0.08


class TestGuards:
    def test_discrete_selection_raises(self):
        @g.gen
        def m():
            z = g.categorical(jnp.log(jnp.array([0.5, 0.5]))) @ "z"
            _ = g.normal(jnp.where(z == 0, -1.0, 1.0), 1.0) @ "y"

        tr, _ = m.importance(jax.random.key(0), ChoiceMap.kw(y=0.5), ())
        try:
            involutive_step(
                jax.random.key(1),
                tr,
                Selection.at["z"],
                aux_walk,
                lambda x, u: (x, u),
            )
            raise AssertionError("expected TypeError")
        except TypeError as e:
            assert "non-differentiable" in str(e)

    def test_vmaps_across_chains(self):
        keys = jax.random.split(jax.random.key(0), 8)
        trs, _ = jax.vmap(
            lambda k: normal_model.importance(k, ChoiceMap.kw(y=2.0), ())
        )(keys)
        move_keys = jax.random.split(jax.random.key(1), 8)
        new_trs, accs = jax.vmap(
            lambda k, t: involutive_mh(
                k, t, Selection.at["x"], aux_walk, reflect
            )
        )(move_keys, trs)
        assert accs.shape == (8,)
        assert new_trs.get_choices()["x"].shape == (8,)
