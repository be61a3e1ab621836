"""Opt-in runtime validation of GFI entry-point inputs.

The reference beartypes its entire public API at import
(`src/genjax/__init__.py:23-33`), paying a per-call Python cost for good
error messages. This build's default leaves checking to JAX's tracer
(zero overhead); `checked_mode()` opts into explicit validation with
targeted messages for the classic mistakes (swapped arguments, a dict
where a ChoiceMap belongs, args not packed in a tuple, a raw int seed
instead of a PRNG key). Checks run at Python trace time only — they cost
nothing inside compiled code.

>>> import genjax_tpu as gx
>>> from genjax_tpu.core.checked import checked_mode
>>> @gx.gen
... def m():
...     return gx.normal(0.0, 1.0) @ "x"
>>> with checked_mode():
...     try:
...         m.simulate(42, ())  # raw seed instead of a key
...     except TypeError as e:
...         print("caught:", "PRNG key" in str(e))
caught: True
"""

import contextlib
from typing import Any

_ENABLED = False


def do_checked(enable: bool = True) -> None:
    """Globally enable/disable GFI input validation."""
    global _ENABLED
    _ENABLED = enable


def is_checked() -> bool:
    return _ENABLED


@contextlib.contextmanager
def checked_mode():
    """Context manager: validate GFI entry-point inputs inside the block."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = True
    try:
        yield
    finally:
        _ENABLED = prev


def _is_prng_key(key: Any) -> bool:
    import jax
    import jax.numpy as jnp

    if not isinstance(key, jax.Array) and not hasattr(key, "dtype"):
        return False
    try:
        dtype = key.dtype
    except Exception:
        return False
    if jnp.issubdtype(dtype, jax.dtypes.prng_key):
        return True
    # Legacy raw uint32[2] keys.
    return dtype == jnp.uint32 and getattr(key, "shape", ())[-1:] == (2,)


def check_key(key: Any, where: str) -> None:
    if _ENABLED and not _is_prng_key(key):
        raise TypeError(
            f"{where}: `key` must be a JAX PRNG key (jax.random.key(seed)); "
            f"got {type(key).__name__}: {key!r}. A raw int seed is not a "
            "key — wrap it: jax.random.key(seed)."
        )


def check_args(args: Any, where: str) -> None:
    if _ENABLED and not isinstance(args, tuple):
        raise TypeError(
            f"{where}: `args` must be the argument TUPLE (use `(x,)` for a "
            f"single argument, `()` for none); got {type(args).__name__}."
        )


def check_choice_map(chm: Any, where: str, what: str = "constraint") -> None:
    if not _ENABLED:
        return
    from genjax_tpu.core.choice_map import ChoiceMap

    if not isinstance(chm, ChoiceMap):
        hint = ""
        if isinstance(chm, dict):
            hint = " Build one from a dict with ChoiceMap.d({...}) or ChoiceMap.kw(...)."
        raise TypeError(
            f"{where}: `{what}` must be a ChoiceMap; got "
            f"{type(chm).__name__}.{hint}"
        )


def check_selection(sel: Any, where: str) -> None:
    if not _ENABLED:
        return
    from genjax_tpu.core.choice_map import Selection

    if not isinstance(sel, Selection):
        raise TypeError(
            f"{where}: expected a Selection (e.g. Selection.at['x']); got "
            f"{type(sel).__name__}."
        )


def check_request(req: Any, where: str) -> None:
    if not _ENABLED:
        return
    from genjax_tpu.core.concepts import EditRequest

    if not isinstance(req, EditRequest):
        raise TypeError(
            f"{where}: expected an EditRequest (Update(...), Regenerate(...), "
            f"HMC(...), ...); got {type(req).__name__}."
        )
