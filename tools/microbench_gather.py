"""Microbenchmark: row-gather formulations for systematic resampling at 1M.

Times, on the real (tunneled) TPU, several lowerings of `x[anc]` where
`x: (N, F) f32` and `anc` is a sorted, near-identity ancestor vector (the
systematic-resampling case). Loops run inside one jit; tunnel floor
subtracted (see bench.py methodology).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
F = 32
REPS = 20


def _force(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, iters=3):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    key = jax.random.key(0)
    x = jax.random.normal(key, (N, F), dtype=jnp.float32)
    # Near-identity sorted ancestors (ESS ~ N/2-ish): repeat some rows.
    w = jax.random.exponential(jax.random.key(1), (N,))
    cdf = jnp.cumsum(w / jnp.sum(w))
    anc = jnp.clip(
        jnp.floor(N * cdf - 0.5).astype(jnp.int32) + 1, 0, N
    )
    # build monotone ancestors (as systematic_resample does)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), anc[:-1]])
    occ = anc > starts
    sidx = jnp.where(occ, starts, N)
    a0 = jnp.zeros((N,), jnp.int32).at[sidx].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    anc = jax.lax.cummax(a0)
    frac_id = float(jnp.mean(anc == jnp.arange(N)))
    print(f"identity fraction: {frac_id:.3f}", file=sys.stderr)

    @jax.jit
    def tiny(v):
        return jnp.sum(v)

    floor = timeit(tiny, jnp.arange(8.0), iters=5)
    print(f"floor: {floor*1e3:.1f} ms", file=sys.stderr)

    def bench(name, body):
        @jax.jit
        def run(x, anc):
            def step(c, _):
                out = body(x + c, anc)  # +c defeats CSE across iterations
                return c + out[0, 0] * 1e-30, None

            return jax.lax.scan(step, jnp.float32(0), None, length=REPS)[0]

        t = max(timeit(run, x, anc) - floor, 1e-9) / REPS
        gbs = 2 * N * F * 4 / t / 1e9  # read + write
        print(f"{name:40s} {t*1e3:7.2f} ms  {gbs:7.1f} GB/s eff")

    bench("jnp.take(axis=0)", lambda x, a: jnp.take(x, a, axis=0))
    bench("at[].get(sorted)", lambda x, a: x.at[a].get(
        indices_are_sorted=True, unique_indices=False, mode="promise_in_bounds"))
    bench("at[].get(unsorted-hint)", lambda x, a: x.at[a].get(
        indices_are_sorted=False, unique_indices=False, mode="promise_in_bounds"))
    bench("where(identity, x, take)", lambda x, a: jnp.where(
        (a == jnp.arange(N))[:, None], x, jnp.take(x, a, axis=0)))
    bench("take along axis1 of x.T", lambda x, a: jnp.take(x.T, a, axis=1).T)
    bench("one-hot-free copy (reference read)", lambda x, a: x * 1.0000001)

    # displacement-bounded windowed gather: out[i] = x[i + d[i]] with d
    # clamped into [-W, W]; realized as sum of W shifted selects.
    def windowed(x, a, W=4):
        i = jnp.arange(N)
        d = jnp.clip(a - i, -W, W)
        out = x
        for s in range(-W, W + 1):
            if s == 0:
                continue
            shifted = jnp.roll(x, -s, axis=0)
            out = jnp.where((d == s)[:, None], shifted, out)
        return out

    bench("windowed select W=4 (9 passes)", windowed)


if __name__ == "__main__":
    main()
