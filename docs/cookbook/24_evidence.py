"""Cookbook: model evidence and Bayes factors — three estimators, one
answer.

The marginal likelihood ("evidence") p(y) is what Bayesian model
comparison runs on, and it is the quantity naive importance sampling
loses first as models grow. This chapter computes the SAME evidence
three ways and then uses evidence to pick between two regression
models:

- `TemperedSMC` — annealing from prior to posterior (good default,
  scales to large particle counts on the mesh),
- `NestedSampler` — live-point shrinkage (the robust choice for
  multimodal posteriors, also yields posterior-weighted samples),
- the exact closed form (available here because the example is
  conjugate — that's what makes it a test and not a demo).
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Regenerate, Selection, Target, gen, mv_normal_diag, normal
from genjax_tpu.inference.nested import NestedSampler
from genjax_tpu.inference.tempered import TemperedSMC


def main():
    # --- one evidence, three estimators ---
    D = 3
    y = jnp.array([1.0, -0.5, 2.0])

    @gen
    def model():
        x = normal(jnp.zeros(D), 1.0) @ "x"
        _ = normal(x, 0.5) @ "y"

    exact = float(jnp.sum(genjax.normal.logpdf(y, 0.0, jnp.sqrt(1.25))))

    tsmc = TemperedSMC(
        n_particles=2048,
        betas=jnp.linspace(0.0, 1.0, 12),
        request=Regenerate(Selection.at["x"]),
    )
    _, log_z_tempered = jax.jit(tsmc.run)(
        jax.random.key(0), Target(model, (), C.kw(y=y))
    )

    ns = NestedSampler(
        model, (), C.kw(y=y), Selection.at["x"],
        n_live=400, n_iters=2400, n_mcmc=20, step_scale=0.4,
    )
    out = jax.jit(ns.run)(jax.random.key(1))

    assert abs(float(log_z_tempered) - exact) < 0.25
    assert abs(float(out["lml"]) - exact) < 0.3
    # nested sampling's dead points double as posterior draws
    w = jax.nn.softmax(out["log_post_weights"])
    post_mean = jnp.sum(w[:, None] * out["dead_choices"]["x"], 0)
    assert jnp.max(jnp.abs(post_mean - 0.8 * y)) < 0.15

    # --- Bayes factor: is the data linear or quadratic? ---
    rng = np.random.default_rng(0)
    xs = jnp.linspace(-2.0, 2.0, 40)
    ys = jnp.asarray(
        0.5 + 0.3 * np.asarray(xs) + 0.8 * np.asarray(xs) ** 2
        + 0.3 * rng.standard_normal(40),
        dtype=jnp.float32,
    )

    def poly_model(degree):
        @gen
        def m(xs):
            coeffs = mv_normal_diag(
                jnp.zeros(degree + 1), jnp.ones(degree + 1)
            ) @ "coeffs"
            design = jnp.stack([xs**k for k in range(degree + 1)], axis=-1)
            _ = normal(design @ coeffs, 0.3 * jnp.ones_like(xs)) @ "ys"

        return m

    def evidence(degree, seed):
        ns = NestedSampler(
            poly_model(degree), (xs,), C.kw(ys=ys),
            Selection.at["coeffs"],
            n_live=400, n_iters=3200, n_mcmc=25, step_scale=0.25,
        )
        return float(jax.jit(ns.run)(jax.random.key(seed))["lml"])

    lml1 = evidence(1, 2)  # linear — misspecified
    lml2 = evidence(2, 3)  # quadratic — the truth
    log_bayes_factor = lml2 - lml1
    # the quadratic term is strong (0.8 with noise 0.3 over x in [-2,2]):
    # decisive evidence for degree 2
    assert log_bayes_factor > 10.0, log_bayes_factor
    print(
        f"ch24 ok: exact={exact:.3f} tempered={float(log_z_tempered):.3f} "
        f"nested={float(out['lml']):.3f} logBF21={log_bayes_factor:.1f}"
    )


if __name__ == "__main__":
    main()
