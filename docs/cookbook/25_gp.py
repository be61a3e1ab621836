"""Cookbook: Gaussian processes — tuning-free latents with elliptical
slice, hyperparameters by Gibbs composition.

The GP recipe that generalizes: put the latent function values behind
one `mv_normal` site (correlated Gaussian prior), sample them with
`EllipticalSlice` (no step size, every move accepted), and alternate
with an MH move on the kernel hyperparameters. The acceptance ratio for
the hyperparameter move automatically includes the latent prior's
density change — the GFI's `Regenerate` weight algebra does the
bookkeeping — so the composition is a valid Gibbs sampler with no
hand-derived ratios.

A conjugate oracle keeps us honest twice over: `models.gp.gp_posterior`
pins the fixed-hyperparameter posterior, and marginalizing f in closed
form gives the exact lengthscale posterior by 1-D quadrature.
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as genjax
from genjax_tpu import ChoiceMap as C
from genjax_tpu import Regenerate, Selection as S, gen, mv_normal, normal
from genjax_tpu.inference.mcmc import mh
from genjax_tpu.inference.requests import EllipticalSlice
from genjax_tpu.models.gp import gp_posterior, rbf_kernel, run_gp_ess

N = 12
XS = jnp.linspace(0.0, 3.0, N)
OBS_NOISE = 0.3


def main():
    rng = np.random.default_rng(0)
    ys = jnp.asarray(
        np.sin(2 * np.asarray(XS)) + OBS_NOISE * rng.standard_normal(N),
        dtype=jnp.float32,
    )

    # --- 1. fixed hyperparameters: ESS vs the conjugate oracle ---
    mean, cov, lml = gp_posterior(XS, ys, OBS_NOISE)
    fs = jax.jit(lambda k: run_gp_ess(k, XS, ys, n_steps=3000))(
        jax.random.key(0)
    )
    assert float(jnp.max(jnp.abs(jnp.mean(fs[800:], 0) - mean))) < 0.1

    # --- 2. unknown lengthscale: ESS-within-Gibbs ---
    @gen
    def gp_hier(xs, ys_noise):
        log_ls = normal(-0.5, 0.5) @ "log_ls"
        K = rbf_kernel(xs, xs, jnp.exp(log_ls)) + 1e-5 * jnp.eye(N)
        f = mv_normal(jnp.zeros(N), K) @ "f"
        _ = normal(f, ys_noise * jnp.ones(N)) @ "y"
        return f

    tr, _ = gp_hier.importance(
        jax.random.key(1), C.kw(y=ys), (XS, OBS_NOISE)
    )

    ess_move = EllipticalSlice(S.at["f"], mean=0.0)
    ls_move = Regenerate(S.at["log_ls"])

    def sweep(t, k):
        k1, k2 = jax.random.split(k)
        t, _ = mh(k1, t, ess_move)   # latents: always accepted
        t, _ = mh(k2, t, ls_move)    # hyperparameter: prior-proposal MH
        return t, t.get_choices()["log_ls"]

    _, ls_chain = jax.jit(
        lambda k, t: jax.lax.scan(sweep, t, jax.random.split(k, 4000))
    )(jax.random.key(2), tr)

    # exact lengthscale posterior by marginalizing f:
    # p(log_ls | y) ∝ N(log_ls; -0.5, 0.5) * N(y; 0, K(ls) + noise^2 I)
    grid = jnp.linspace(-2.5, 1.5, 201)

    def marginal_ll(log_ls):
        Sm = rbf_kernel(XS, XS, jnp.exp(log_ls)) + (
            OBS_NOISE**2 + 1e-5
        ) * jnp.eye(N)
        sign, logdet = jnp.linalg.slogdet(Sm)
        return -0.5 * ys @ jnp.linalg.solve(Sm, ys) - 0.5 * (
            logdet + N * jnp.log(2.0 * jnp.pi)
        )

    logpost = jax.vmap(marginal_ll)(grid) + genjax.normal.logpdf(
        grid, -0.5, 0.5
    )
    w = jax.nn.softmax(logpost)
    exact_ls_mean = float(jnp.sum(w * grid))

    est = float(jnp.mean(ls_chain[1000:]))
    assert abs(est - exact_ls_mean) < 0.15, (est, exact_ls_mean)
    print(
        f"ch25 ok: log-lengthscale posterior mean {est:.3f} "
        f"(quadrature oracle {exact_ls_mean:.3f}); fixed-ls lml {float(lml):.2f}"
    )


if __name__ == "__main__":
    main()
