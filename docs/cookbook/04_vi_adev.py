"""Cookbook: variational inference with ADEV gradient estimators."""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Target, gen, normal
from genjax_tpu.adev import expectation, flip_enum
from genjax_tpu.inference import vi


def main():
    # --- raw ADEV: differentiate an expectation exactly (enumeration) ---
    @expectation
    def objective(p):
        b = flip_enum(p)
        return jax.lax.cond(b, lambda: 3.0, lambda: -1.0)

    (grad,) = objective.grad_estimate(jax.random.key(0), (0.4,))
    assert jnp.allclose(grad, 4.0)  # d/dp [3p - (1-p)]

    # --- ELBO-trained guide on a conjugate model ---
    @gen
    def model(_vmu, _vls):
        mu = normal(0.0, 1.0) @ "mu"
        _ = normal(mu, 1.0) @ "y"

    @genjax.marginal()
    @gen
    def guide(target):
        vmu, vls = target.args
        _ = vi.normal_reparam(vmu, jnp.exp(vls)) @ "mu"

    elbo_grad = jax.jit(
        vi.ELBO(guide, lambda vmu, vls: Target(model, (vmu, vls), C.kw(y=2.0)))
    )
    params, key = (0.0, 0.0), jax.random.key(1)
    for _ in range(400):
        key, sub = jax.random.split(key)
        grads = elbo_grad(sub, params)
        params = tuple(p - 2e-2 * g for p, g in zip(params, grads))
    # posterior is N(1, 1/sqrt(2))
    assert jnp.abs(params[0] - 1.0) < 0.25
    assert jnp.abs(jnp.exp(params[1]) - 0.707) < 0.2

    # --- or let the library do all of the above in one call ---
    @gen
    def plain_model():
        mu = normal(0.0, 1.0) @ "mu"
        _ = normal(mu, 1.0) @ "y"

    auto_params, auto_guide, make_target, _ = vi.advi(
        jax.random.key(2), plain_model, (), C.kw(y=2.0), n_steps=1500
    )
    assert jnp.abs(auto_params["mu"]["mu"] - 1.0) < 0.15
    _, latents = auto_guide.random_weighted(
        jax.random.key(3), make_target(auto_params)
    )
    assert jnp.isfinite(latents["mu"])

    print("vi cookbook OK")


if __name__ == "__main__":
    main()
