"""Shared-args chain/particle layout (`mcmc.share_chain_args`): chains
and particle collections carry ONE copy of the model arguments; every
driver (run_chains, resampling, sharded SMC) maps them broadcast instead
of gathering/selecting N identical copies."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Selection
from genjax_tpu.core.gather import take_rows
from genjax_tpu.inference.mcmc import mh_chain, run_chains, share_chain_args
from genjax_tpu.inference.requests import MALA
from genjax_tpu.inference.smc import ParticleCollection


@g.gen
def regression(X):
    w = g.mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
    _ = g.normal(X @ w, 1.0) @ "ys"


X = jax.random.normal(jax.random.key(9), (32, 3))
YS = jnp.zeros(32)
N = 64


def make_chains():
    keys = jax.random.split(jax.random.key(0), N)
    trs, ws = jax.vmap(
        lambda k: regression.importance(k, ChoiceMap.kw(ys=YS), (X,))
    )(keys)
    return share_chain_args(trs, (X,)), ws


class TestSharedChains:
    def test_args_unbatched(self):
        trs, _ = make_chains()
        assert trs.get_args()[0].shape == (32, 3)
        assert trs.get_score().shape == (N,)

    def test_run_chains_preserves_layout_and_correctness(self):
        trs, _ = make_chains()
        req = MALA(Selection.at["w"], jnp.asarray(1e-2))
        finals, accs = run_chains(jax.random.key(1), trs, req, 10)
        assert finals.get_args()[0].shape == (32, 3)  # still shared
        assert accs.shape == (N, 10)
        # Every chain's score is a fresh exact joint of its choices.
        ws = finals.get_choices()["w"]
        scores = jax.vmap(
            lambda w: regression.assess(
                ChoiceMap.kw(w=w, ys=YS), (X,)
            )[0]
        )(ws)
        assert jnp.allclose(finals.get_score(), scores, atol=1e-4)

    def test_chain_results_match_batched_layout(self):
        """Shared-args and broadcast-args chains compute identical
        results (same keys, same densities)."""
        keys = jax.random.split(jax.random.key(0), N)
        trs_b, _ = jax.vmap(
            lambda k: regression.importance(k, ChoiceMap.kw(ys=YS), (X,))
        )(keys)
        trs_s = share_chain_args(trs_b, (X,))
        req = MALA(Selection.at["w"], jnp.asarray(1e-2))
        f_b, _ = run_chains(jax.random.key(1), trs_b, req, 5)
        f_s, _ = run_chains(jax.random.key(1), trs_s, req, 5)
        assert jnp.allclose(
            f_b.get_choices()["w"], f_s.get_choices()["w"], atol=1e-6
        )


class TestSharedParticles:
    def test_take_rows_passes_shared_leaves_through(self):
        tree = {"w": jnp.arange(8.0), "X": X}
        out = take_rows(tree, jnp.array([3, 3, 0, 1, 2, 2, 7, 5]), n_rows=8)
        assert out["X"] is tree["X"]
        assert jnp.allclose(out["w"][:2], 3.0)

    def test_collection_resample_with_shared_args(self):
        keys = jax.random.split(jax.random.key(2), N)
        trs, ws = jax.vmap(
            lambda k: regression.importance(k, ChoiceMap.kw(ys=YS), (X,))
        )(keys)
        trs = share_chain_args(trs, (X,))
        coll = ParticleCollection(trs, ws, jnp.array(True))
        res = coll.resample(jax.random.key(3), "systematic")
        new = res.get_particles()
        # shared arg survives unbatched and untouched
        assert new.get_args()[0].shape == (32, 3)
        assert jnp.array_equal(new.get_args()[0], X)
        # gathered state is consistent: every particle's score matches a
        # fresh assess against the SHARED design matrix
        scores = jax.vmap(
            lambda w: regression.assess(ChoiceMap.kw(w=w, ys=YS), (X,))[0]
        )(new.get_choices()["w"])
        assert jnp.allclose(new.get_score(), scores, atol=1e-4)

    def test_sharded_smc_resample_with_shared_args(self):
        from genjax_tpu.parallel import ShardedSMC, particle_mesh

        mesh = particle_mesh(8)
        keys = jax.random.split(jax.random.key(4), 128)
        trs, ws = jax.vmap(
            lambda k: regression.importance(k, ChoiceMap.kw(ys=YS), (X,))
        )(keys)
        trs = share_chain_args(trs, (X,))
        coll = ParticleCollection(trs, ws, jnp.array(True))
        smc = ShardedSMC(n_particles=128, mesh=mesh)
        out = jax.jit(smc.maybe_resample)(jax.random.key(5), coll)
        parts = out.get_particles()
        assert parts.get_args()[0].shape == (32, 3)
        scores = jax.vmap(
            lambda w: regression.assess(ChoiceMap.kw(w=w, ys=YS), (X,))[0]
        )(parts.get_choices()["w"])
        assert jnp.allclose(parts.get_score(), scores, atol=1e-4)


class TestSharedArgsDrivers:
    def test_smcdriver_extend_rejuvenate_shared(self):
        from genjax_tpu.inference.smc import SMCDriver
        from genjax_tpu.inference.sp import Target
        from genjax_tpu.core.requests import Regenerate

        @g.gen
        def seq(X):
            w = g.mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
            y0 = g.normal(jnp.sum(X[0] * w), 1.0) @ "y0"
            y1 = g.normal(jnp.sum(X[1] * w), 1.0) @ "y1"
            return y0 + y1

        driver = SMCDriver(n_particles=N)
        target = Target(seq, (X,), ChoiceMap.kw(y0=0.5))
        coll = driver.init(jax.random.key(0), target)
        coll = ParticleCollection(
            share_chain_args(coll.get_particles(), (X,)),
            coll.get_log_weights(),
            coll.is_valid,
        )
        coll = driver.extend(jax.random.key(1), coll, ChoiceMap.kw(y1=-0.25))
        coll = driver.rejuvenate(
            jax.random.key(2), coll, Regenerate(Selection.at["w"])
        )
        parts = coll.get_particles()
        assert parts.get_args()[0].shape == (32, 3)
        ws = parts.get_choices()["w"]
        scores = jax.vmap(
            lambda w: seq.assess(
                ChoiceMap.kw(w=w, y0=0.5, y1=-0.25), (X,)
            )[0]
        )(ws)
        assert jnp.allclose(parts.get_score(), scores, atol=1e-4)

    def test_sharded_extend_rejuvenate_shared(self):
        from genjax_tpu.parallel import ShardedSMC, particle_mesh
        from genjax_tpu.inference.sp import Target
        from genjax_tpu.core.requests import Regenerate

        @g.gen
        def seq(X):
            w = g.mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
            y0 = g.normal(jnp.sum(X[0] * w), 1.0) @ "y0"
            y1 = g.normal(jnp.sum(X[1] * w), 1.0) @ "y1"
            return y0 + y1

        mesh = particle_mesh(8)
        smc = ShardedSMC(n_particles=128, mesh=mesh)
        target = Target(seq, (X,), ChoiceMap.kw(y0=0.5))
        coll = jax.jit(smc.init)(jax.random.key(0), target)
        coll = ParticleCollection(
            share_chain_args(coll.get_particles(), (X,)),
            coll.get_log_weights(),
            coll.is_valid,
        )
        coll = jax.jit(
            lambda k, c: smc.extend(k, c, ChoiceMap.kw(y1=-0.25))
        )(jax.random.key(1), coll)
        coll = jax.jit(
            lambda k, c: smc.rejuvenate(k, c, Regenerate(Selection.at["w"]))
        )(jax.random.key(2), coll)
        parts = coll.get_particles()
        assert parts.get_args()[0].shape == (32, 3)
        ws = parts.get_choices()["w"]
        scores = jax.vmap(
            lambda w: seq.assess(
                ChoiceMap.kw(w=w, y0=0.5, y1=-0.25), (X,)
            )[0]
        )(ws)
        assert jnp.allclose(parts.get_score(), scores, atol=1e-4)


class TestAmbiguousLeadingDim:
    def test_data_length_equal_to_batch_stays_batched(self):
        """An argument whose own leading dimension equals the chain
        count is indistinguishable from a batched leaf — sharing must
        SKIP it (correct broadcast form) and results must match the
        plain batched layout exactly."""
        n = 16  # chains == data rows
        Xn = jax.random.normal(jax.random.key(20), (n, 3))
        ysn = jnp.zeros(n)

        @g.gen
        def reg_n(Xa):
            w = g.mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
            _ = g.normal(Xa @ w, 1.0) @ "ys"

        keys = jax.random.split(jax.random.key(21), n)
        trs, _ = jax.vmap(
            lambda k: reg_n.importance(k, ChoiceMap.kw(ys=ysn), (Xn,))
        )(keys)
        shared = share_chain_args(trs, (Xn,))
        # ambiguous leaf kept batched: (n, n, 3)
        assert shared.get_args()[0].shape == (n, n, 3)
        req = MALA(Selection.at["w"], jnp.asarray(1e-2))
        f_b, _ = run_chains(jax.random.key(22), trs, req, 5)
        f_s, _ = run_chains(jax.random.key(22), shared, req, 5)
        assert jnp.allclose(
            f_b.get_choices()["w"], f_s.get_choices()["w"], atol=1e-6
        )

    def test_importance_k_ambiguous_args(self):
        """ImportanceK's automatic sharing must stay correct when
        k_particles equals the dataset length."""
        from genjax_tpu.inference.smc import ImportanceK
        from genjax_tpu.inference.sp import Target

        n = 32
        Xn = jax.random.normal(jax.random.key(23), (n, 2))
        ysn = jnp.zeros(n)

        @g.gen
        def reg_n(Xa):
            w = g.mv_normal_diag(jnp.zeros(2), jnp.ones(2)) @ "w"
            _ = g.normal(Xa @ w, 1.0) @ "ys"

        target = Target(reg_n, (Xn,), ChoiceMap.kw(ys=ysn))
        alg = ImportanceK(target, k_particles=n)  # ambiguous on purpose
        coll = alg.run_smc(jax.random.key(24))
        parts = coll.get_particles()
        scores = jax.vmap(
            lambda w: reg_n.assess(ChoiceMap.kw(w=w, ys=ysn), (Xn,))[0]
        )(parts.get_choices()["w"])
        assert jnp.allclose(parts.get_score(), scores, atol=1e-4)
        # and through re-targeting (random_weighted path)
        w, latents = alg.random_weighted(jax.random.key(25), target)
        assert jnp.isfinite(w)


class TestCollectionIndexing:
    def test_getitem_preserves_shared_args(self):
        """coll[i] must not data-index shared argument leaves
        (code-review finding)."""
        keys = jax.random.split(jax.random.key(26), N)
        trs, ws = jax.vmap(
            lambda k: regression.importance(k, ChoiceMap.kw(ys=YS), (X,))
        )(keys)
        trs = share_chain_args(trs, (X,))
        coll = ParticleCollection(trs, ws, jnp.array(True))
        particle, w3 = coll[3]
        assert particle.get_args()[0].shape == (32, 3)
        assert jnp.allclose(w3, ws[3])
        sc, _ = regression.assess(
            ChoiceMap.kw(w=particle.get_choices()["w"], ys=YS), (X,)
        )
        assert jnp.allclose(particle.get_score(), sc, atol=1e-5)


class TestStaticSiteArgs:
    """ARCHITECTURE.md 4c: literal distribution args live in the treedef,
    not as per-particle columns; constness survives edit chains and never
    captures data-derived values."""

    def test_literal_args_not_batched_under_vmap(self):
        import jax
        import jax.numpy as jnp
        import jax.tree_util as jtu

        import genjax_tpu as g

        @g.gen
        def m():
            x = g.normal(0.0, 1.0) @ "x"
            _ = g.normal(x, 1.0) @ "y"
            return x

        trs = jax.vmap(m.simulate, in_axes=(0, None))(
            jax.random.split(jax.random.key(0), 32), ()
        )
        widths = [
            l.shape for l in jtu.tree_leaves(trs) if getattr(l, "ndim", 0)
        ]
        # x's literal (0.0, 1.0) and y's scale literal are static: only
        # retval, x value/score, y loc (=x, genuinely dynamic), y
        # value/score remain as (32,) leaves.
        assert len(widths) == 6, widths
        # and get_args still round-trips the literals
        one = jtu.tree_map(lambda v: v[0], trs)
        assert one.subtraces["x"].get_args() == (0.0, 1.0)

    def test_python_float_constraint_stays_dynamic(self):
        import jax
        import jax.numpy as jnp
        import jax.tree_util as jtu

        import genjax_tpu as g
        from genjax_tpu import ChoiceMap

        @g.gen
        def m():
            x = g.normal(0.0, 1.0) @ "x"
            return x

        # Eager generate with a python-float constraint: the VALUE must
        # stay a dynamic leaf (freezing it would bake data into the
        # treedef and break structure equality with jit-built traces).
        tr, _ = m.importance(jax.random.key(0), ChoiceMap.kw(x=2.5), ())
        tr2 = m.simulate(jax.random.key(1), ())
        assert jtu.tree_structure(tr) == jtu.tree_structure(tr2)

    def test_edit_preserves_packing(self):
        import jax
        import jax.numpy as jnp
        import jax.tree_util as jtu

        import genjax_tpu as g
        from genjax_tpu import ChoiceMap, Diff, Regenerate, Selection, Update

        @g.gen
        def m():
            x = g.normal(0.0, 1.0) @ "x"
            _ = g.normal(x, 1.0) @ "y"
            return x

        tr = m.simulate(jax.random.key(0), ())
        for req in (
            Update(ChoiceMap.kw(x=1.0)),
            Regenerate(Selection.at["x"]),
        ):
            new_tr, *_ = req.edit(jax.random.key(1), tr, Diff.no_change(()))
            assert jtu.tree_structure(new_tr) == jtu.tree_structure(tr), req
