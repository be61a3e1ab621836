"""Microbench round 2: gather scaling, monotone scatter, repeat, and
fill-forward doubling — the building blocks for streaming resampling."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
REPS = 10


def _force(out):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))


def timeit(fn, *args, iters=3):
    _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - t0) / iters


def make_anc(key):
    w = jax.random.exponential(key, (N,))
    cdf = jnp.cumsum(w / jnp.sum(w))
    ends = jnp.clip(jnp.floor(N * cdf - 0.5).astype(jnp.int32) + 1, 0, N)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    occ = ends > starts
    sidx = jnp.where(occ, starts, N)
    a0 = jnp.zeros((N,), jnp.int32).at[sidx].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    return jax.lax.cummax(a0), starts, occ, sidx


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    anc, starts, occ, sidx = make_anc(jax.random.key(1))
    counts_all = jnp.bincount(anc, length=N)
    print("max count:", int(counts_all.max()), "max gap:",
          int(jnp.max(jnp.diff(jnp.where(occ, jnp.arange(N), 0)[occ.argsort()[-10:]]))) if False else "-",
          file=sys.stderr)

    @jax.jit
    def tiny(v):
        return jnp.sum(v)

    floor = timeit(tiny, jnp.arange(8.0), iters=5)
    print(f"floor: {floor*1e3:.1f} ms", file=sys.stderr)

    def bench(name, body, *arrs, nbytes):
        @jax.jit
        def run(*a):
            def step(c, _):
                out = body(*((a[0] + c,) + a[1:]))
                return c + jax.tree_util.tree_leaves(out)[0].ravel()[0] * 1e-30, None

            return jax.lax.scan(step, jnp.float32(0), None, length=REPS)[0]

        t = max(timeit(run, *arrs) - floor, 1e-9) / REPS
        print(f"{name:42s} {t*1e3:7.2f} ms  {nbytes/t/1e9:7.1f} GB/s eff")
        return t

    for F in (1, 4, 8, 32):
        x = jax.random.normal(jax.random.key(2), (N, F))
        bench(f"take rows F={F}", lambda x, a: jnp.take(x, a, axis=0), x, anc,
              nbytes=2 * N * F * 4)

    F = 8
    x = jax.random.normal(jax.random.key(2), (N, F))

    bench("monotone scatter rows F=8 (set, drop)",
          lambda x, s: jnp.zeros((N, F), x.dtype).at[s].set(x, mode="drop"),
          x, sidx, nbytes=2 * N * F * 4)

    counts = counts_all
    bench("jnp.repeat counts F=8",
          lambda x, c: jnp.repeat(x, c, axis=0, total_repeat_length=N),
          x, counts, nbytes=2 * N * F * 4)

    # fill-forward doubling: y starts as x scattered implicitly — here we
    # just measure the 20-stage propagate cost on (N, F) rows.
    def fill_forward(y, src0):
        src = src0
        for k in range(20):
            hop = 1 << k
            y_sh = jnp.roll(y, hop, axis=0)
            src_sh = jnp.roll(src, hop)
            take = src_sh > src
            y = jnp.where(take[:, None], y_sh, y)
            src = jnp.maximum(src, src_sh)
        return y

    src0 = jnp.where(occ, jnp.arange(N), -1)
    bench("fill-forward doubling 20 stages F=8", fill_forward, x, src0,
          nbytes=2 * N * F * 4)

    # gather on int32 scalars (for lazy-permutation composition)
    idx32 = anc.astype(jnp.int32)
    bench("take scalars int32", lambda p, a: jnp.take(p, a), idx32, anc,
          nbytes=2 * N * 4)

    # sort-based: lax.sort with payload columns
    keys_f = jax.random.normal(jax.random.key(3), (N,))
    bench("lax.sort key + F=8 payload",
          lambda x, k: jax.lax.sort((k,) + tuple(x[:, i] for i in range(F)),
                                    num_keys=1)[1],
          x, keys_f, nbytes=2 * N * F * 4)


if __name__ == "__main__":
    main()
