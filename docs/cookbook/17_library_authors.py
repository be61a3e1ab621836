"""Cookbook: extending the framework (for library authors).

Mirrors the reference cookbook's
inactive/library_author/dimap_combinator.ipynb: how new combinators and
generative-function types are built from the pieces the framework
exposes — `dimap` for argument/return plumbing, `exact_density` for new
distributions, and a full `GenerativeFunction` subclass when you need
custom GFI semantics.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap, gen, normal
from genjax_tpu.core.gfi import GenerativeFunction, Trace
from genjax_tpu.core.pytree import Pytree


def main():
    key = jax.random.key(0)

    # --- combinators from dimap ---------------------------------------------
    # Most "new combinators" are argument/return transformations around an
    # inner generative function. `standardize`: run a model on z-scored
    # inputs, return de-standardized outputs.
    def standardized(gen_fn, mean, std):
        return gen_fn.dimap(
            pre=lambda x: ((x - mean) / std,),
            post=lambda _args, _xformed, retval: retval * std + mean,
        )

    @gen
    def unit_model(x):
        return normal(x, 0.1) @ "v"

    scaled = standardized(unit_model, mean=100.0, std=10.0)
    tr = scaled.simulate(key, (105.0,))
    # The inner model saw 0.5; the retval is rescaled back.
    assert abs(float(tr.get_retval()) - 105.0) < 5.0
    # Full GFI comes for free — including incremental edits (argdiffs
    # propagate through the mappings):
    new_tr, w, _, _ = tr.update(
        key, ChoiceMap.kw(v=0.5), (genjax.Diff.no_change(105.0),)
    )
    assert jnp.allclose(new_tr.get_choices()["v"], 0.5)

    # --- a custom GenerativeFunction type -----------------------------------
    # When semantics (not just plumbing) are new, subclass
    # GenerativeFunction. A `Deterministic` node: no randomness, no
    # choices, score 0 — useful for wrapping fixed transformations into
    # model pipelines.
    @Pytree.dataclass
    class DeterministicTrace(Trace):
        gen_fn: GenerativeFunction = Pytree.field()
        args: tuple = Pytree.field()
        retval: jnp.ndarray = Pytree.field()

        def get_args(self):
            return self.args

        def get_retval(self):
            return self.retval

        def get_score(self):
            return jnp.asarray(0.0)

        def get_choices(self):
            return ChoiceMap.empty()

        def get_gen_fn(self):
            return self.gen_fn

    @Pytree.dataclass
    class Deterministic(GenerativeFunction):
        fn: object = Pytree.static()

        def simulate(self, key, args):
            return DeterministicTrace(self, args, self.fn(*args))

        def assess(self, choices, args):
            return jnp.asarray(0.0), self.fn(*args)

        def generate(self, key, constraint, args):
            return self.simulate(key, args), jnp.asarray(0.0)

        def edit(self, key, trace, request, argdiffs):
            # No choices, score 0: every edit re-runs the function on the
            # new primal arguments with zero weight. Implementing `edit`
            # is what lets the node live inside models driven by
            # update/Regenerate/MCMC (without it, those paths raise
            # NotImplementedError).
            from genjax_tpu import Diff

            primals = Diff.tree_primal(argdiffs)
            new_trace = self.simulate(key, primals)
            return (
                new_trace,
                jnp.asarray(0.0),
                Diff.unknown_change(new_trace.get_retval()),
                request,
            )

    double = Deterministic(lambda x: 2.0 * x)

    @gen
    def pipeline():
        base = normal(0.0, 1.0) @ "base"
        return double(base) @ "doubled"

    tr = pipeline.simulate(key, ())
    assert jnp.allclose(tr.get_retval(), 2.0 * tr.get_choices()["base"])
    # score contribution of the deterministic node is zero: the trace's
    # joint score is just the base normal's density. (Note `assess`
    # intentionally raises MissingAddress for addresses absent from the
    # constraint — reference parity — so a choice-free node is scored
    # through simulate/generate, not assess.)
    b = tr.get_choices()["base"]
    expected = -0.5 * b**2 - 0.5 * jnp.log(2 * jnp.pi)
    assert jnp.allclose(tr.get_score(), expected, atol=1e-6)

    # Because Deterministic implements `edit`, the pipeline works under
    # MCMC: regenerate the base choice, the doubled value follows.
    from genjax_tpu import Regenerate, Selection

    new_tr, w, _, _ = Regenerate(Selection.at["base"]).edit(
        key, tr, genjax.Diff.no_change(())
    )
    assert jnp.allclose(
        new_tr.get_retval(), 2.0 * new_tr.get_choices()["base"]
    )

    # --- new distributions ---------------------------------------------------
    # (See cookbook 11 for exact_density; the factory covers most needs.
    # For *estimated* densities — marginals, algorithms — implement the
    # stochastic probability interface instead: cookbook 12.)

    # --- custom handlers: extending the language itself ----------------------
    # Reference GenJAX's extension point for new *execution semantics* is
    # subclassing `StatefulHandler` and intercepting the `trace_p`
    # primitive while a jaxpr interpreter re-walks the staged program
    # (reference `_src/core/compiler/interpreters/stateful.py:32`,
    # `_src/generative_functions/static.py:156`). This build has no
    # `trace_p` and no jaxpr walking: `dist(args) @ "addr"` dispatches to
    # the innermost `TraceHandler` on a dynamically-scoped stack at
    # Python trace time (`lang/interop.py`), so a new language feature is
    # a ~15-line handler — and the staged XLA program is exactly what the
    # handler's Python executed, with zero interception machinery left in
    # the compiled code.
    #
    # Worked example: `intervene`, Pearl's do-operator. Run a model with
    # chosen addresses CLAMPED to given values — causal surgery: the
    # clamped sites contribute no randomness and no density; downstream
    # sites see the forced values.
    from genjax_tpu.lang.interop import TraceHandler, handler_context

    class DoHandler(TraceHandler):
        """Clamp `interventions` addresses; sample everything else
        forward (per-site keys via counter fold-in, the same PRNG
        discipline as the built-in handlers)."""

        def __init__(self, key, interventions):
            self.key = key
            self.count = 0
            self.interventions = interventions
            self.values = {}

        def handle_trace(self, addr, gen_fn, args):
            if addr in self.interventions:
                v = self.interventions[addr]
            else:
                self.count += 1
                site_key = jax.random.fold_in(self.key, self.count)
                v = gen_fn.simulate(site_key, args).get_retval()
            self.values[addr] = v
            return v

    def intervene(model, interventions):
        """`do(X=x)`: run `model` with `interventions` clamped."""

        def run(key, args):
            handler = DoHandler(key, interventions)
            with handler_context(handler):
                retval = model.source(*args)
            return retval, handler.values

        return run

    @gen
    def chain_model():
        x = normal(0.0, 1.0) @ "x"
        y = normal(2.0 * x, 0.1) @ "y"
        z = normal(y, 0.1) @ "z"
        return z

    do_y = intervene(chain_model, {"y": jnp.asarray(10.0)})
    z_val, sites = do_y(key, ())
    # Downstream of the intervention follows the clamped value (z ~
    # N(10, 0.1) regardless of x)...
    assert abs(float(z_val) - 10.0) < 1.0
    assert float(sites["y"]) == 10.0
    # ...and the handler costs nothing at runtime: the whole intervened
    # program jits (handlers execute during tracing only).
    z_jit, _ = jax.jit(do_y)(key, ())
    assert abs(float(z_jit) - 10.0) < 1.0

    print("library-author cookbook: all checks passed")


if __name__ == "__main__":
    main()
