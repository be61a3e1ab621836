"""Zero-FLOP trace skeletons for every trace type (SURVEY §7 hard part 5:
lots of machinery — multi_switch, invalid_subset — quietly depends on
abstract shape evaluation working for each combinator)."""

import jax.numpy as jnp
import pytest

import genjax_tpu as g


@g.gen
def leaf_model(mu):
    return g.normal(mu, 1.0) @ "x"


@g.gen
def step(c, _x):
    z = g.normal(c, 1.0) @ "z"
    return z, z


CASES = [
    ("static", leaf_model, (0.0,)),
    ("distribution", g.normal, (0.0, 1.0)),
    ("vmap", leaf_model.vmap(in_axes=(0,)), (jnp.zeros(4),)),
    ("scan", step.scan(n=5), (0.0, None)),
    ("repeat", leaf_model.repeat(n=3), (0.0,)),
    ("mask", leaf_model.mask(), (True, 0.0)),
    ("dimap", leaf_model.map(lambda r: r * 2), (0.0,)),
    ("or_else", g.or_else(leaf_model, leaf_model), (True, (0.0,), (1.0,))),
    ("switch", g.switch(leaf_model, leaf_model), (0, (0.0,), (1.0,))),
    ("mix", g.mix(leaf_model, leaf_model), (jnp.zeros(2), (0.0,), (1.0,))),
]


@pytest.mark.parametrize("name,gf,args", CASES, ids=[c[0] for c in CASES])
def test_zero_trace(name, gf, args):
    zt = gf.get_zero_trace(*args)
    assert jnp.allclose(zt.get_score(), 0.0)
    # the skeleton must expose choices and retval with real shapes
    _ = zt.get_retval()
    chm = zt.get_choices()
    assert chm is not None


@pytest.mark.parametrize("name,gf,args", CASES, ids=[c[0] for c in CASES])
def test_abstract_call(name, gf, args):
    out = gf.__abstract_call__(*args)
    assert out is not None or True  # must not raise
