"""Profiling helpers: `jax.profiler` trace capture and named scopes on
inference entry points.

The reference ships no profiling integration (SURVEY.md §5); this module
is new capability: wrap any inference step in `annotate` to get labelled
regions in TPU profiler traces, or capture a full trace with
`profile_trace`.
"""

import contextlib
import functools
from typing import Callable

import jax


def annotate(name: str) -> Callable:
    """Decorator: wrap a function in a `jax.named_scope` so it appears as
    a labelled region in profiler traces and HLO."""

    def decorator(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        return wrapped

    return decorator


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/genjax_tpu_profile"):
    """Capture a profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
