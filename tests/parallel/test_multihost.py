"""Multi-host layer (`parallel/multihost.py`) on the virtual 8-device
mesh: hybrid mesh construction, island SMC statistics, unbiased LML
pooling, and cross-host state assembly (single-process code paths; the
multi-process branches delegate to jax.distributed / mesh_utils)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import genjax_tpu as g
from genjax_tpu import ChoiceMap, Target
from genjax_tpu.parallel import (
    global_from_process_local,
    hybrid_mesh,
    initialize_multihost,
    island_smc,
    pooled_lml,
    process_local_rows,
)


@g.gen
def conjugate():
    x = g.normal(0.0, 1.0) @ "x"
    y = g.normal(x, 1.0) @ "y"
    return y


EXACT_LML = -0.25 - 0.5 * jnp.log(2 * jnp.pi * 2.0)
TARGET = Target(conjugate, (), ChoiceMap.kw(y=1.0))


class TestMeshConstruction:
    def test_initialize_single_process_noop(self):
        assert initialize_multihost() is False

    def test_hybrid_mesh_defaults(self):
        mesh = hybrid_mesh()
        assert mesh.axis_names == ("islands", "particles")
        assert mesh.shape["islands"] == 1
        assert mesh.shape["particles"] == len(jax.devices())

    def test_hybrid_mesh_explicit_layout(self):
        mesh = hybrid_mesh(island_devices=2, particle_devices=4)
        assert mesh.shape["islands"] == 2
        assert mesh.shape["particles"] == 4


class TestIslandSMC:
    @pytest.fixture(scope="class")
    def smc(self):
        mesh = hybrid_mesh(island_devices=2, particle_devices=4)
        return island_smc(n_islands=4, n_particles=256, mesh=mesh)

    def test_island_lml_near_exact(self, smc):
        coll = jax.jit(smc.init)(jax.random.key(0), TARGET)
        lmls = jax.jit(smc.per_chain_lml)(coll)
        assert lmls.shape == (4,)
        pooled = pooled_lml(lmls)
        # 4 x 256 = 1024 particles on a conjugate target
        assert jnp.abs(pooled - EXACT_LML) < 0.05

    def test_islands_are_independent(self, smc):
        """Island-local resampling must leave other islands' particles
        bit-identical (no cross-DCN particle exchange)."""
        coll = jax.jit(smc.init)(jax.random.key(1), TARGET)
        # Skew island 0's weights so only it crosses the ESS threshold.
        lw = coll.get_log_weights()
        skewed = lw.at[0].set(
            jnp.where(jnp.arange(256) == 0, 100.0, -100.0)
        )
        coll = type(coll)(coll.get_particles(), skewed, coll.is_valid)
        out = jax.jit(smc.maybe_resample)(jax.random.key(2), coll)
        xs_before = coll.get_particles().get_choices()["x"]
        xs_after = out.get_particles().get_choices()["x"]
        # island 0 collapsed onto its dominant particle
        assert jnp.allclose(xs_after[0], xs_before[0, 0])
        # islands 1..3 untouched
        assert jnp.array_equal(xs_after[1:], xs_before[1:])

    def test_pooled_lml_is_density_mean(self):
        lmls = jnp.array([-1.0, -2.0, -3.0])
        expected = jnp.log(jnp.mean(jnp.exp(lmls)))
        assert jnp.allclose(pooled_lml(lmls), expected, atol=1e-6)


class TestStateAssembly:
    def test_global_from_process_local_single_process(self):
        mesh = hybrid_mesh(island_devices=1, particle_devices=8)
        rows = jnp.arange(32.0).reshape(32, 1)
        arr = global_from_process_local(
            {"w": rows}, mesh, P("particles")
        )["w"]
        assert arr.sharding == NamedSharding(mesh, P("particles"))
        assert jnp.array_equal(arr, rows)

    def test_process_local_rows_roundtrip(self):
        mesh = hybrid_mesh(island_devices=1, particle_devices=8)
        rows = jnp.arange(64.0).reshape(64, 1)
        arr = jax.device_put(rows, NamedSharding(mesh, P("particles")))
        back = process_local_rows(arr)
        assert isinstance(back, np.ndarray)
        assert np.array_equal(back, np.asarray(rows))


class TestReviewRegressions:
    def test_process_local_rows_dedups_replicated_axis(self):
        """A per-island array replicated over the particle axis must
        contribute each row range exactly once (code-review finding:
        pre-fix, it was duplicated once per replica shard)."""
        mesh = hybrid_mesh(island_devices=2, particle_devices=4)
        x = jax.device_put(
            jnp.arange(8.0), NamedSharding(mesh, P("islands"))
        )
        out = process_local_rows(x)
        assert out.shape == (8,)
        assert np.array_equal(out, np.arange(8.0))

    def test_sharded_mh_chains_with_shared_args(self):
        """sharded_mh_chains on the share_chain_args layout (code-review
        finding: the inner vmap used in_axes=0 and crashed)."""
        import genjax_tpu as g
        from genjax_tpu.inference.mcmc import share_chain_args
        from genjax_tpu.inference.requests import MALA
        from genjax_tpu.parallel import particle_mesh, sharded_mh_chains

        @g.gen
        def reg(X):
            w = g.mv_normal_diag(jnp.zeros(3), jnp.ones(3)) @ "w"
            _ = g.normal(X @ w, 1.0) @ "ys"

        X = jax.random.normal(jax.random.key(30), (32, 3))
        keys = jax.random.split(jax.random.key(31), 64)
        trs, _ = jax.vmap(
            lambda k: reg.importance(k, ChoiceMap.kw(ys=jnp.zeros(32)), (X,))
        )(keys)
        trs = share_chain_args(trs, (X,))
        mesh = particle_mesh(8, axis_name="chains")
        finals, accs = sharded_mh_chains(
            jax.random.key(32),
            trs,
            MALA(g.Selection.at["w"], jnp.asarray(1e-2)),
            5,
            mesh,
            "chains",
        )
        assert finals.get_args()[0].shape == (32, 3)
        assert accs.shape == (64, 5)
        ws = finals.get_choices()["w"]
        scores = jax.vmap(
            lambda w: reg.assess(
                ChoiceMap.kw(w=w, ys=jnp.zeros(32)), (X,)
            )[0]
        )(ws)
        assert jnp.allclose(finals.get_score(), scores, atol=1e-4)
