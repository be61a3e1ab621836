"""Reversible-jump MCMC: transdimensional chain against the exact
model posterior (mvn-evidence oracle) and structural guards.

Model: two observation blocks either share one mean (branch 0, dim 1)
or carry separate means (branch 1, dim 2); flat prior over branches.
Both evidences are closed-form multivariate-normal integrals, so the
exact P(m=1 | y) pins the chain's branch occupancy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genjax_tpu as g
from genjax_tpu import ChoiceMap as C
from genjax_tpu import ChoiceMapBuilder as CMB
from genjax_tpu import Regenerate, Selection as S
from genjax_tpu.inference.mcmc import mh
from genjax_tpu.inference.rjmcmc import JumpProposal, reversible_jump

N = 4
SIG = 0.5
_rng = np.random.default_rng(1)
YS1 = jnp.asarray(0.35 + SIG * _rng.standard_normal(N), dtype=jnp.float32)
YS2 = jnp.asarray(-0.35 + SIG * _rng.standard_normal(N), dtype=jnp.float32)


@g.gen
def b0():
    mu = g.normal(0.0, 1.0) @ "mu"
    return (mu, mu)


@g.gen
def b1():
    mu1 = g.normal(0.0, 1.0) @ "mu1"
    mu2 = g.normal(0.0, 1.0) @ "mu2"
    return (mu1, mu2)


@g.gen
def model(ys1, ys2):
    m = g.flip(0.5) @ "m"
    means = g.switch(b0, b1)(m.astype(jnp.int32), (), ()) @ "k"
    _ = g.normal(means[0] * jnp.ones(N), SIG) @ "y1"
    _ = g.normal(means[1] * jnp.ones(N), SIG) @ "y2"


def _log_ev(y, blocks):
    n = len(y)
    cov = SIG**2 * np.eye(n)
    for b in blocks:
        for i in b:
            for j in b:
                cov[i, j] += 1.0
    _, logdet = np.linalg.slogdet(cov)
    return float(
        -0.5 * y @ np.linalg.solve(cov, y)
        - 0.5 * (logdet + n * np.log(2 * np.pi))
    )


def exact_post_m1():
    y = np.concatenate([np.asarray(YS1), np.asarray(YS2)])
    e0 = _log_ev(y, [list(range(2 * N))])
    e1 = _log_ev(y, [list(range(N)), list(range(N, 2 * N))])
    return 1.0 / (1.0 + np.exp(e0 - e1))


TAU = 0.7


@g.gen
def aux_up():
    _ = g.normal(0.0, TAU) @ "u"


@g.gen
def aux_down():
    return 0.0


UP = JumpProposal(
    read=lambda chm: chm["k", "mu"].unmask(0.0),
    aux=aux_up,
    involution=lambda mu, u: ((mu + u["u"], mu - u["u"]), C.empty()),
    constraint=lambda p: CMB["m"].set(True)
    | CMB["k", "mu1"].set(p[0])
    | CMB["k", "mu2"].set(p[1]),
)
DOWN = JumpProposal(
    read=lambda chm: (
        chm["k", "mu1"].unmask(0.0),
        chm["k", "mu2"].unmask(0.0),
    ),
    aux=aux_down,
    involution=lambda p, u: ((p[0] + p[1]) / 2.0, C.kw(u=(p[0] - p[1]) / 2.0)),
    constraint=lambda mu: CMB["m"].set(False) | CMB["k", "mu"].set(mu),
)
IS_UP = lambda chm: ~chm["m"]


def _chain(key, tr, n_steps):
    within = Regenerate(S.at["k", ...])

    def sweep(t, k):
        k1, k2 = jax.random.split(k)
        t, acc_j = reversible_jump(k1, t, UP, DOWN, IS_UP)
        t, _ = mh(k2, t, within)
        return t, (t.get_choices()["m"], acc_j)

    return jax.lax.scan(sweep, tr, jax.random.split(key, n_steps))


class TestModelPosterior:
    def test_branch_occupancy_matches_exact(self):
        exact = exact_post_m1()
        assert 0.2 < exact < 0.8  # the test is only sharp mid-range
        tr, _ = model.importance(
            jax.random.key(0), C.kw(y1=YS1, y2=YS2), (YS1, YS2)
        )
        _, (ms, accs) = jax.jit(lambda k, t: _chain(k, t, 20000))(
            jax.random.key(1), tr
        )
        est = float(jnp.mean(ms[4000:]))
        assert abs(est - exact) < 0.05, (est, exact)
        assert 0.1 < float(jnp.mean(accs)) < 0.9

    def test_within_model_conditional_posterior(self):
        """Conditional on branch 1, mu1's samples must match its
        conjugate posterior N(sum(y1)/(1/1+N/sig^2-ish) ...)."""
        tr, _ = model.importance(
            jax.random.key(2), C.kw(y1=YS1, y2=YS2), (YS1, YS2)
        )
        within = Regenerate(S.at["k", ...])

        def sweep(t, k):
            k1, k2 = jax.random.split(k)
            t, _ = reversible_jump(k1, t, UP, DOWN, IS_UP)
            t, _ = mh(k2, t, within)
            chm = t.get_choices()
            return t, (chm["m"], chm["k", "mu1"].unmask(0.0))

        _, (ms, mu1s) = jax.jit(
            lambda k, t: jax.lax.scan(sweep, t, jax.random.split(k, 20000))
        )(jax.random.key(3), tr)
        sel = ms[4000:]
        vals = mu1s[4000:]
        # conjugate: prec = 1 + N/SIG^2, mean = (sum y1 / SIG^2) / prec
        prec = 1.0 + N / SIG**2
        cmean = float(jnp.sum(YS1) / SIG**2 / prec)
        est = float(jnp.sum(vals * sel) / jnp.sum(sel))
        assert abs(est - cmean) < 0.1, (est, cmean)


class TestGuards:
    def test_dimension_mismatch_raises(self):
        bad_up = JumpProposal(
            read=UP.read,
            aux=aux_up,
            # drops the auxiliary dimension: 1+1 -> 1+0
            involution=lambda mu, u: (mu + u["u"], C.empty()),
            constraint=lambda p: CMB["m"].set(True)
            | CMB["k", "mu1"].set(p),
        )
        tr, _ = model.importance(
            jax.random.key(0), C.kw(y1=YS1, y2=YS2), (YS1, YS2)
        )
        with pytest.raises(ValueError, match="conserve total dimension"):
            reversible_jump(jax.random.key(1), tr, bad_up, DOWN, IS_UP)
