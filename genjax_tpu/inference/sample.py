"""One-call posterior sampling: init -> warmup -> sample -> diagnose.

Beyond the reference (whose users hand-roll importance init, tuning, MH
loops, and convergence checks — its tests do exactly that,
`tests/inference/test_requests.py:94-141`): `sample_posterior` wires the
framework's pieces into the standard workflow in one call, the way a
production user expects —

1. a chain batch initialized by vmapped `importance` under the
   constraint (independent overdispersed starts),
2. warmup (`adaptation.warmup_chains` for HMC/MALA, `requests.nuts_warmup`
   for NUTS, `chees.chees_warmup` for automatic trajectory lengths),
3. sampling with the tuned kernel,
4. split R-hat and ESS on every collected latent.

Everything stays one compiled program per phase; chains vectorize with
vmap and shard over a mesh via GSPMD (jit with a sharded chain axis —
tests/parallel/test_sharded_warmup.py).
"""

from typing import Any

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from genjax_tpu.core.choice_map import ChoiceMap, Selection
from genjax_tpu.core.gfi import GenerativeFunction
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.typing import FloatArray, PRNGKey

__all__ = ["PosteriorSamples", "posterior_predictive", "sample_posterior"]


def posterior_predictive(
    key: PRNGKey,
    model: GenerativeFunction[Any],
    args: tuple,
    latents: ChoiceMap,
    n_draws: int | None = None,
):
    """Sample the model's remaining (non-latent) sites given a batch of
    posterior latent draws: `latents` is a ChoiceMap with a leading draw
    axis (e.g. `PosteriorSamples.flat()`); each row is constrained into
    `importance` and the unconstrained sites — the observables — are
    sampled fresh. Returns the predictive ChoiceMap (leading draw axis).

    >>> import jax, jax.numpy as jnp
    >>> import genjax_tpu as gx
    >>> from genjax_tpu.inference.sample import posterior_predictive, sample_posterior
    >>> @gx.gen
    ... def model():
    ...     mu = gx.normal(0.0, 1.0) @ "mu"
    ...     _ = gx.normal(mu, 1.0) @ "obs"
    >>> out = sample_posterior(jax.random.key(0), model, gx.ChoiceMap.kw(obs=1.0),
    ...     algorithm="hmc", n_chains=32, n_warmup=50, n_samples=60, L=5)
    >>> pred = posterior_predictive(jax.random.key(1), model, (), out.flat())
    >>> pred["obs"].shape  # one predictive obs per posterior draw
    (1920,)
    """
    if n_draws is None:
        n_draws = jnp.shape(jtu.tree_leaves(latents)[0])[0]
    keys = jax.random.split(key, n_draws)
    trs, _ = jax.vmap(
        lambda k, chm: model.importance(k, chm, args)
    )(keys, latents)
    return trs.get_choices().filter(~latents.get_selection())


@Pytree.dataclass
class PosteriorSamples(Pytree):
    """Sampling result: `samples` is a pytree of `(n_chains, n_samples,
    ...)` arrays (one per selected address), with matching per-leaf
    `rhat`/`ess` diagnostics and the warmup's tuned kernel parameters."""

    samples: Any
    rhat: Any
    ess: Any
    accept_rate: FloatArray
    tuned: Any

    def flat(self):
        """Samples flattened to `(n_chains * n_samples, ...)` per leaf."""
        return jtu.tree_map(
            lambda v: v.reshape((-1,) + v.shape[2:]), self.samples
        )


def sample_posterior(
    key: PRNGKey,
    model: GenerativeFunction[Any],
    constraint: ChoiceMap,
    args: tuple = (),
    *,
    selection: Selection | None = None,
    algorithm: str = "chees",
    n_chains: int = 64,
    n_warmup: int = 200,
    n_samples: int = 500,
    L: int = 10,
    max_depth: int = 6,
    thin_burn: int = 0,
    init: Any = None,
) -> PosteriorSamples:
    """Sample `p(latents | constraint)` for `model(*args)`.

    `selection` defaults to every unconstrained address (the latents);
    the selected choices must be continuous (gradient-based kernels).
    `algorithm` is `"chees"` (automatic trajectory lengths, default),
    `"hmc"` (fixed L with trajectory jitter), `"mala"`, `"nuts"`
    (per-draw adaptive trajectories, up to `2**max_depth - 1` leapfrog
    steps each), or `"elliptical"` (tuning-free slice moves for
    zero-mean Gaussian-prior latents — no gradient, no step size).

    `init` overrides initial values for (a subset of) the latents at
    chain construction — a `ChoiceMap`, or a callable `key -> ChoiceMap`
    for randomized per-chain starts (Stan's `uniform(-2, 2)`
    convention). Latents initialized this way are still sampled by the
    kernel. Use it when the PRIOR is a bad initializer: heavy-tailed
    scale priors (half-Cauchy) start some chains at extreme values
    where a globally-adapted step size cannot move them — the classic
    funnel stall (see `models/hierarchical.py`).

    >>> import jax, jax.numpy as jnp
    >>> import genjax_tpu as gx
    >>> from genjax_tpu.inference.sample import sample_posterior
    >>> @gx.gen
    ... def model():
    ...     mu = gx.normal(0.0, 1.0) @ "mu"
    ...     _ = gx.normal(mu, 1.0) @ "obs"
    >>> out = sample_posterior(
    ...     jax.random.key(0), model, gx.ChoiceMap.kw(obs=1.0),
    ...     n_chains=32, n_warmup=60, n_samples=80, algorithm="hmc", L=5)
    >>> out.samples["mu"].shape
    (32, 80)
    >>> bool(out.rhat["mu"] < 1.1), bool(abs(jnp.mean(out.samples["mu"]) - 0.5) < 0.2)
    (True, True)
    """
    from genjax_tpu.inference.diagnostics import (
        effective_sample_size,
        split_rhat,
    )

    k_init, k_warm, k_run = jax.random.split(key, 3)
    keys = jax.random.split(k_init, n_chains)

    def _init_one(k):
        if init is None:
            merged = constraint
        else:
            k, k_over = jax.random.split(k)
            over = init(k_over) if callable(init) else init
            merged = constraint | over
        return model.importance(k, merged, args)[0]

    traces = jax.vmap(_init_one)(keys)
    if selection is None:
        # From the OBSERVATION constraint only: init-overridden latents
        # are still latents (sampled by the kernel).
        selection = ~constraint.get_selection()

    def collect(tr):
        return tr.get_choices().filter(selection)

    if algorithm == "chees":
        from genjax_tpu.inference.chees import chees_warmup, run_chees_chains

        traces, tuned = chees_warmup(
            k_warm, traces, selection, n_steps=n_warmup
        )
        # run_chees_chains collects on the BATCH per step: (steps, chains,
        # ...) — transpose to the (chains, steps, ...) diagnostics layout.
        _, collected = run_chees_chains(
            k_run, traces, selection, tuned, n_samples, collect=collect
        )
        samples = jtu.tree_map(lambda v: jnp.swapaxes(v, 0, 1), collected)
        accept = tuned.accept_rate
    elif algorithm in ("hmc", "mala"):
        from genjax_tpu.inference.adaptation import warmup_chains
        from genjax_tpu.inference.mcmc import run_chains
        from genjax_tpu.inference.requests import HMC, MALA

        traces, tuned = warmup_chains(
            k_warm, traces, selection, n_steps=n_warmup,
            algorithm=algorithm, L=L,
        )
        if algorithm == "hmc":
            req = HMC(selection, tuned.eps, L, tuned.inv_mass, jitter=0.2)
        else:
            req = MALA(selection, tuned.eps, tuned.inv_mass)
        _, samples = run_chains(
            k_run, traces, req, n_samples, collect=collect
        )
        accept = tuned.accept_rate
    elif algorithm == "nuts":
        from genjax_tpu.inference.mcmc import run_chains
        from genjax_tpu.inference.requests import NUTS
        from genjax_tpu.inference.requests.nuts import nuts_warmup

        traces, tuned = nuts_warmup(
            k_warm, traces, selection, n_steps=n_warmup,
            max_depth=max_depth,
        )
        req = NUTS(selection, tuned.eps, max_depth, tuned.inv_mass)
        _, samples = run_chains(
            k_run, traces, req, n_samples, collect=collect
        )
        accept = tuned.accept_rate
    elif algorithm == "elliptical":
        # Tuning-free: no warmup adaptation phase — the first n_warmup
        # collected sweeps are simply discarded as burn-in. Requires
        # Gaussian priors over the selected sites (zero prior mean; use
        # `EllipticalSlice` directly for nonzero means).
        from genjax_tpu.inference.mcmc import run_chains
        from genjax_tpu.inference.requests import EllipticalSlice

        req = EllipticalSlice(selection, mean=0.0)
        _, samples = run_chains(
            k_run, traces, req, n_warmup + n_samples, collect=collect
        )
        samples = jtu.tree_map(lambda v: v[:, n_warmup:], samples)
        accept = jnp.asarray(1.0)  # slice moves always accept
        tuned = None
    else:
        raise ValueError(
            f"sample_posterior: unknown algorithm {algorithm!r}; expected "
            "'chees', 'hmc', 'mala', 'nuts', or 'elliptical'."
        )

    if thin_burn:
        samples = jtu.tree_map(lambda v: v[:, thin_burn:], samples)
    return PosteriorSamples(
        samples=samples,
        rhat=split_rhat(samples),
        ess=effective_sample_size(samples),
        accept_rate=accept,
        tuned=tuned,
    )
