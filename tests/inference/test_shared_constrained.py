"""Shared constrained-site values (ARCHITECTURE.md 4b family).

`vmap(generate)` broadcasts observed data into identical (K, ...) rows;
`share_constrained_values` stores it once. The reference has no analogue
(single-device, no batched layout concerns)."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Regenerate, Selection, Target
from genjax_tpu.inference.smc import SMCDriver, share_constrained_values


@g.gen
def conj():
    x = g.normal(0.0, 1.0) @ "x"
    y = g.normal(x, 1.0) @ "y"
    return y


@g.gen
def vec_obs():
    x = g.normal(0.0, 1.0) @ "x"
    ys = g.mv_normal_diag(jnp.full(4, 0.0) + x, jnp.ones(4)) @ "ys"
    return ys


K = 128


def _batch(target):
    keys = jax.random.split(jax.random.key(0), K)
    trs, ws = jax.vmap(target.importance, in_axes=(0, None))(
        keys, ChoiceMap.empty()
    )
    return trs, ws


class TestSharing:
    def test_scalar_observation_is_shared(self):
        target = Target(conj, (), ChoiceMap.kw(y=1.0))
        trs, _ = _batch(target)
        shared = share_constrained_values(trs, target.constraint, K)
        assert jnp.shape(shared.subtraces["y"].value) == ()
        assert jnp.shape(shared.subtraces["y"].score) == (K,)
        assert jnp.shape(shared.subtraces["x"].value) == (K,)
        assert float(shared.subtraces["y"].value) == 1.0

    def test_vector_observation_is_shared(self):
        obs = jnp.array([0.1, -0.2, 0.3, 0.4])
        target = Target(vec_obs, (), ChoiceMap.kw(ys=obs))
        trs, _ = _batch(target)
        shared = share_constrained_values(trs, target.constraint, K)
        assert jnp.shape(shared.subtraces["ys"].value) == (4,)
        assert jnp.allclose(shared.subtraces["ys"].value, obs)

    def test_latents_left_batched(self):
        target = Target(conj, (), ChoiceMap.kw(y=1.0))
        trs, _ = _batch(target)
        shared = share_constrained_values(trs, target.constraint, K)
        assert jnp.shape(shared.subtraces["x"].value) == (K,)

    def test_ambiguous_leading_dim_left_batched(self):
        # An observation whose own leading dim equals K is ambiguous
        # under the leading-dim convention: must stay batched.
        @g.gen
        def m():
            x = g.normal(0.0, 1.0) @ "x"
            ys = g.mv_normal_diag(jnp.full(K, 0.0) + x, jnp.ones(K)) @ "ys"
            return ys

        obs = jnp.linspace(-1, 1, K)
        target = Target(m, (), ChoiceMap.kw(ys=obs))
        trs, _ = _batch(target)
        shared = share_constrained_values(trs, target.constraint, K)
        assert jnp.shape(shared.subtraces["ys"].value) == (K, K)

    def test_masked_constraint_left_batched(self):
        from genjax_tpu.core.mask import Mask

        target = Target(conj, (), ChoiceMap.kw(y=1.0))
        trs, _ = _batch(target)
        masked = ChoiceMap.kw(y=Mask(jnp.asarray(1.0), jnp.asarray(True)))
        shared = share_constrained_values(trs, masked, K)
        assert jnp.shape(shared.subtraces["y"].value) == (K,)


class TestDriversShareAndStayCorrect:
    def test_smcdriver_collection_shares_and_rounds_match_exact(self):
        target = Target(conj, (), ChoiceMap.kw(y=1.0))
        driver = SMCDriver(n_particles=4096, ess_threshold=2.0)

        @jax.jit
        def round_(key):
            col = driver.init(key, target)
            lml = col.get_log_marginal_likelihood_estimate()
            col = driver.maybe_resample(jax.random.fold_in(key, 1), col)
            col = driver.rejuvenate(
                jax.random.fold_in(key, 2), col, Regenerate(Selection.at["x"])
            )
            return lml, col

        lml, col = round_(jax.random.key(1))
        p = col.get_particles()
        assert jnp.shape(p.subtraces["y"].value) == ()
        # exact: y ~ N(0, 2) at y=1; posterior x | y=1 ~ N(0.5, 0.5)
        exact_lml = -0.5 * jnp.log(2 * jnp.pi * 2.0) - 1.0 / 4.0
        assert abs(float(lml) - float(exact_lml)) < 0.05
        xs = p.get_choices()["x"]
        assert abs(float(jnp.mean(xs)) - 0.5) < 0.06

    def test_sharded_round_equals_unsharded_statistics(self):
        from genjax_tpu.parallel import ShardedSMC, particle_mesh

        target = Target(conj, (), ChoiceMap.kw(y=1.0))
        smc = ShardedSMC(
            n_particles=4096, mesh=particle_mesh(), ess_threshold=2.0
        )

        @jax.jit
        def round_(key):
            col = smc.init(key, target)
            lml = smc.lml(col)
            col = smc.maybe_resample(jax.random.fold_in(key, 1), col)
            col = smc.rejuvenate(
                jax.random.fold_in(key, 2), col, Regenerate(Selection.at["x"])
            )
            return lml, jnp.mean(col.get_particles().get_choices()["x"])

        lml, xmean = round_(jax.random.key(3))
        exact_lml = -0.5 * jnp.log(2 * jnp.pi * 2.0) - 1.0 / 4.0
        assert abs(float(lml) - float(exact_lml)) < 0.05
        assert abs(float(xmean) - 0.5) < 0.06

    def test_checkpoint_roundtrip_with_shared_leaves(self, tmp_path):
        from genjax_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

        target = Target(conj, (), ChoiceMap.kw(y=1.0))
        driver = SMCDriver(n_particles=64)
        col = jax.jit(driver.init)(jax.random.key(0), target)
        save_checkpoint(str(tmp_path / "col"), col)
        back = restore_checkpoint(str(tmp_path / "col"), col)
        assert jtu.tree_structure(back) == jtu.tree_structure(col)
        for a, b in zip(jtu.tree_leaves(back), jtu.tree_leaves(col)):
            assert jnp.array_equal(a, b)
