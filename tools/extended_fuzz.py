"""Extended offline structural-GFI fuzz: random deep specs, fresh seeds.

The CI fuzzer (tests/lang/test_gfi_structural_fuzz.py) is deliberately
bounded: derandomized Hypothesis examples, random structures capped at
depth 2, and two fixed depth-3 structures — a ~5-minute suite slot. This
tool runs the SAME contract battery unbounded: random depth-3 nests
INCLUDING the closure-capture family (which the CI random sweep's
strategy omits), random constraint subsets, fresh seeds each run,
deadline-bounded. Full battery on depth<=2 structures; rotated identity
on depth-3 (12-20 s each with the full battery).

Findings to date: the r5 out-of-support guard family
(distributions/library.py::_guard_support) — a cross-branch Update
transplanting a normal draw onto a beta site scored NaN — surfaced by
this sweep at structure #51 of its first run. After that fix, a
confirmation sweep (seed 987654, 5400 s budget) passed 1000+ random
structures with zero contract violations.

Usage:
    python tools/extended_fuzz.py [budget_seconds] [seed]
Exits nonzero if any structure violates the GFI contract.
"""

import importlib.util
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

_spec = importlib.util.spec_from_file_location(
    "gfi_fuzz", os.path.join(REPO, "tests/lang/test_gfi_structural_fuzz.py")
)
mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(mod)

HEADS1 = ["scan", "repeat", "mask", "dimap", "capture"]
HEADS2 = ["call", "switch", "mix"]

budget = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0
rng = random.Random(int(sys.argv[2]) if len(sys.argv) > 2 else time.time_ns())
DEADLINE = time.monotonic() + budget


def rand_spec(depth):
    if depth <= 1 or rng.random() < 0.25:
        return ("leaf", rng.randrange(mod.N_LEAVES))
    h = rng.choice(HEADS1 + HEADS2)
    if h in HEADS2:
        return (h, rand_spec(depth - 1), rand_spec(depth - 1))
    return (h, rand_spec(depth - 1))


def depth_of(s):
    return 1 + max(
        (depth_of(c) for c in s[1:] if isinstance(c, tuple)), default=0
    )


n = 0
fails = 0
t0 = time.monotonic()
while time.monotonic() < DEADLINE:
    s = rand_spec(rng.choice([2, 2, 3, 3, 3]))
    seed = rng.randrange(2**31)
    x = rng.uniform(-1.5, 1.5)
    bits = rng.randrange(16)
    which = None if depth_of(s) <= 2 else seed
    try:
        mod.check_contract(s, seed=seed, x=x, bits=bits, which=which)
    except Exception as e:
        fails += 1
        print(
            f"FAIL #{fails}: spec={s} seed={seed} x={x:.4f} bits={bits} "
            f"which={which}\n  {type(e).__name__}: {e}",
            flush=True,
        )
        if fails >= 5:
            break
    n += 1
    if n % 50 == 0:
        jax.clear_caches()  # XLA:CPU mmap-budget hygiene (CLAUDE.md)
        print(
            f"[{time.monotonic() - t0:7.1f}s] {n} structures checked, "
            f"{fails} failures",
            flush=True,
        )

print(
    f"DONE: {n} structures, {fails} failures, {time.monotonic() - t0:.0f}s",
    flush=True,
)
sys.exit(1 if fails else 0)
