"""Cookbook: debugging tools — time travel, runtime checks, rendering."""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import Mask, do_checkify, gen, normal
from genjax_tpu.time_travel import rec, tag, time_machine


def main():
    # --- time-travel debugging of a deterministic computation ---
    def compute(x):
        a = rec(x * 2.0, "doubled")
        b = tag(a + 1.0, "shifted")
        return b**2

    dbg = time_machine(compute)(3.0)
    assert dbg.retval == 49.0
    assert dbg.jump("doubled").current() == 6.0
    remixed = dbg.remix(10.0)  # what if the doubled value had been 10?
    assert remixed.retval == 121.0

    # --- checkify: opt-in runtime validity checks ---
    m = Mask(jnp.asarray(1.0), jnp.asarray(False))
    # outside do_checkify, unmask is silent (fast path)
    _ = m.unmask()
    # with a default, always safe:
    assert m.unmask(default=jnp.asarray(9.0)) == 9.0
    with do_checkify():
        from jax.experimental import checkify as jcheckify

        def f():
            return m.unmask()

        err, _ = jcheckify.checkify(f)()
        assert err.get() is not None  # invalid unmask detected

    # --- checked mode: typed errors at the API boundary ---
    # The reference beartypes its whole API at import; here the same
    # coverage is installed at import but stays inert until checked mode
    # activates (zero overhead on traced paths otherwise).
    from genjax_tpu import ChoiceMap
    from genjax_tpu.core.checked import checked_mode

    @gen
    def gm():
        return normal(0.0, 1.0) @ "x"

    with checked_mode():
        try:
            gm.simulate(42, ())  # raw seed, not a PRNG key
            raise AssertionError("should have raised")
        except TypeError as e:
            assert "PRNG" in str(e)
        try:
            gm.generate(jax.random.key(0), {"x": 1.0}, ())  # dict, not ChoiceMap
            raise AssertionError("should have raised")
        except TypeError as e:
            assert "ChoiceMap" in str(e)
        chm = ChoiceMap.kw(x=1.0)
        try:
            chm.merge({"y": 2.0})  # boundary check on every public method
            raise AssertionError("should have raised")
        except TypeError as e:
            assert "merge" in str(e)

    # --- impossible constraints score -inf, never NaN ---
    # Every bounded-support density guards its support
    # (distributions/library.py::_guard_support): constraining a value
    # the model cannot produce yields score/weight -inf — an explicit,
    # testable "impossible trace" — where TFP-backed densities (and
    # hence the reference) return NaN or a silently wrong finite value.
    # Detect bad constraints with jnp.isneginf, not jnp.isnan.
    from genjax_tpu import beta

    @gen
    def bounded():
        p = beta(2.0, 2.0) @ "p"
        return p

    score, _ = bounded.assess(ChoiceMap.kw(p=-0.3), ())  # outside (0, 1)
    assert jnp.isneginf(score)
    _, w = bounded.generate(jax.random.key(1), ChoiceMap.kw(p=-0.3), ())
    assert jnp.isneginf(w)  # importance weight: this constraint has
    # zero density, so any MH move proposing it is rejected and any
    # particle carrying it dies at the next resampling.

    # --- rich rendering ---
    @gen
    def model():
        return normal(0.0, 1.0) @ "x"

    tr = model.simulate(jax.random.key(0), ())
    html = tr.render_html()
    assert isinstance(html, str) and len(html) > 0

    print("debugging cookbook OK")


if __name__ == "__main__":
    main()
