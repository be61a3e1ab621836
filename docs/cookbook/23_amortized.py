"""Cookbook: amortized inference — train a neural proposal once, reuse
it on every new observation.

The guides in chapters 4 and 20 optimize fresh variational parameters
per dataset. Amortized inference instead trains a NETWORK mapping
observations to guide parameters, so posterior approximation at test
time is one forward pass — and the trained guide doubles as an SIR
proposal whose importance weights are far flatter than the prior's.

Everything here composes from existing pieces: a flax MLP, the
`vi.normal_reparam` reparameterized guide site, ADEV `ELBO` gradients
(vmapped over a batch of observations and averaged — linearity of
expectation makes the mean of per-example gradient estimates an
unbiased gradient of the average ELBO), and `ImportanceK` with a custom
proposal.
"""

import jax
import jax.numpy as jnp

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Target, gen, normal
from genjax_tpu.inference import vi
from genjax_tpu.inference.smc import ImportanceK, ess


def main():
    import flax.linen as nn
    import optax

    # Model: x ~ N(0,1), y ~ N(x, 0.5). Exact posterior given y:
    # N(0.8 y, 0.2) — the optimal amortized guide is linear in y, so a
    # small MLP must recover it.
    @gen
    def model(_net_params, y_obs):
        x = normal(0.0, 1.0) @ "x"
        _ = normal(x, 0.5) @ "y"
        return x

    class GuideNet(nn.Module):
        @nn.compact
        def __call__(self, y):
            h = nn.tanh(nn.Dense(16)(jnp.atleast_1d(y)))
            out = nn.Dense(2)(h)
            return out[0], nn.softplus(out[1]) + 1e-3

    net = GuideNet()

    # ADEV objectives differentiate a flat tuple of array arguments, so
    # carry the network weights as ONE raveled vector (a single leaf)
    # and unravel inside the guide — also the layout optax steps fastest.
    k_data, k_init, k_train = jax.random.split(jax.random.key(0), 3)
    xs = jax.random.normal(k_data, (256,))
    ys = xs + 0.5 * jax.random.normal(jax.random.fold_in(k_data, 1), (256,))

    from jax.flatten_util import ravel_pytree

    params0, unravel = ravel_pytree(net.init(k_init, ys[0]))

    @genjax.marginal()
    @gen
    def guide(target):
        flat_params, y_obs = target.args
        mu, sigma = net.apply(unravel(flat_params), y_obs)
        _ = vi.normal_reparam(mu, sigma) @ "x"

    def make_target(flat_params, y_obs):
        return Target(model, (flat_params, y_obs), C.kw(y=y_obs))

    elbo_grad = vi.ELBO(guide, make_target)

    def batch_grad(key, params, ys):
        keys = jax.random.split(key, ys.shape[0])
        per_example = jax.vmap(
            lambda k, y: elbo_grad(k, (params, y))[0]
        )(keys, ys)
        return jax.tree_util.tree_map(lambda g: jnp.mean(g, 0), per_example)

    optimizer = optax.adam(3e-3)

    def train_step(carry, step_key):
        params, opt_state = carry
        grads = batch_grad(step_key, params, ys)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), None

    (params, _), _ = jax.lax.scan(
        train_step,
        (params0, optimizer.init(params0)),
        jax.random.split(k_train, 600),
    )

    # --- test time: one forward pass approximates any posterior ---
    for y_test in (-1.5, 0.0, 2.0):
        mu, sigma = net.apply(unravel(params), jnp.asarray(y_test))
        assert abs(float(mu) - 0.8 * y_test) < 0.12, (y_test, float(mu))
        assert abs(float(sigma) - 0.2**0.5) < 0.12

    # --- and doubles as an SIR proposal with flat weights ---
    y_new = jnp.asarray(2.0)
    target = Target(model, (params, y_new), C.kw(y=y_new))
    k_eval = jax.random.key(7)
    prior_coll = ImportanceK(target, k_particles=512).run_smc(k_eval)
    neural_coll = ImportanceK(
        target, guide, k_particles=512
    ).run_smc(k_eval)
    ess_prior = float(ess(prior_coll.log_weights))
    ess_neural = float(ess(neural_coll.log_weights))
    # the trained proposal is near-posterior, so its ESS approaches K
    # while prior-proposal ESS degrades with the informative y
    assert ess_neural > 2.0 * ess_prior, (ess_prior, ess_neural)
    assert ess_neural > 400
    print(f"ch23 ok: ESS prior={ess_prior:.0f} neural={ess_neural:.0f}")


if __name__ == "__main__":
    main()
