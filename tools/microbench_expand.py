"""Time expand_rows_packed vs jnp.take at 1M on the real TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.ops.expand import expand_rows_packed

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


def main():
    print("device:", jax.devices()[0], file=sys.stderr)
    w = jax.random.exponential(jax.random.key(1), (N,))
    cdf = jnp.cumsum(w / jnp.sum(w))
    cum = jnp.clip(jnp.floor(N * cdf - 0.5).astype(jnp.int32) + 1, 0, N)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    occ = cum > starts
    sidx = jnp.where(occ, starts, N)
    a0 = jnp.zeros((N,), jnp.int32).at[sidx].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    anc = jax.lax.cummax(a0)

    @jax.jit
    def tiny(v):
        return jnp.sum(v)

    floor = timeit(tiny, jnp.arange(8.0), iters=5)
    print(f"floor: {floor*1e3:.1f} ms", file=sys.stderr)

    def bench(name, body, *arrs):
        @jax.jit
        def run(*a):
            def step(c, _):
                out = body(a[0] + c, *a[1:])
                return c + out.ravel()[0] * 1e-30, None

            return jax.lax.scan(step, jnp.float32(0), None, length=REPS)[0]

        t = max(timeit(run, *arrs) - floor, 1e-9) / REPS
        print(f"{name:34s} {t*1e3:7.2f} ms")
        return t

    for F in (1, 4, 8):
        x = jax.random.normal(jax.random.key(2), (N, F))
        bench(f"take F={F}", lambda x, a: jnp.take(x, a, axis=0), x, anc)
        bench(f"expand F={F}", expand_rows_packed, x, cum)
    # correctness on-device at scale
    x = jax.random.normal(jax.random.key(2), (N, 4))
    want = jnp.take(x, anc, axis=0)
    got = expand_rows_packed(x, cum)
    print("exact@1M:", bool(jnp.array_equal(want, got)))


if __name__ == "__main__":
    main()
