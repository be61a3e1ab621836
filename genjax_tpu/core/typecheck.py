"""Whole-API runtime type validation (reference beartype parity).

The reference instruments its entire public API with beartype at import
(`/root/reference/src/genjax/__init__.py:23-33`, conf at `:26-31`), so a
malformed argument anywhere raises a typed error naming the parameter.
This build installs lightweight annotation-driven wrappers once at
import (`instrument()`, called from `genjax_tpu/__init__.py`), ON BY
DEFAULT for the same out-of-the-box protection: a dict passed where a
ChoiceMap belongs, a Selection/ChoiceMap swap, or a raw-int seed raises
a typed error naming the parameter without any opt-in. The checks are a
handful of `isinstance` tests per public call at Python call time —
i.e. trace time only; compiled HLO is identical (`do_typecheck(False)`
turns them off for trace-time-critical host loops). The deeper GFI
entry-point validation (`core/checked.py`) stays opt-in via
`checked_mode()` / `do_checked(True)`, which also forces these wrappers
on. Only annotations whose violation signals a real user mistake are
enforced:

- framework classes (`ChoiceMap`, `Selection`, `Trace`, `EditRequest`,
  `GenerativeFunction`, `Mask`, `Diff`, ...) — a dict where a ChoiceMap
  belongs, a ChoiceMap where a Selection belongs, swapped arguments;
- `tuple` (model `args` not packed in a tuple);
- parameters named `key` annotated `jax.Array` (raw int seeds);
- `Callable` (non-callable sources/mappings);
- unions of the above (plus `None`).

Anything else (array-likes, scalars, TypeVars, `Any`) is left to JAX's
own tracer errors — enforcing those would reject legitimate duck-typed
inputs that `jnp.asarray` happily accepts.

Checks run at Python call time only, i.e. at trace time; compiled code
never sees them.
"""

import functools
import inspect
import types
import typing
from typing import Any, Callable, Union

import jax
import numpy as np

from genjax_tpu.core import checked

_MARK = "__gx_typechecked__"

# Default-on (reference beartype parity). Trace-time-only cost; flip off
# with `do_typecheck(False)` for hosts that retrace public entry points
# in a tight Python loop.
_ENABLED = True


def do_typecheck(enable: bool = True) -> None:
    """Globally enable/disable the always-on public-API argument checks
    (independent of the deeper opt-in `checked_mode()` validation, which
    forces them on while active)."""
    global _ENABLED
    _ENABLED = enable


def is_typechecked() -> bool:
    return _ENABLED or checked.is_checked()

# Accepted wherever an array or numeric scalar is annotated. Deliberately
# wide — rejecting e.g. a python int where `jax.Array` is annotated would
# fight `jnp.asarray`'s own promotions. The point is to reject dicts,
# strings, ChoiceMaps, and other structurally-wrong inputs.
_ARRAYLIKE = (jax.Array, np.ndarray, np.generic, bool, int, float)


def _is_framework_class(ann: Any) -> bool:
    return (
        inspect.isclass(ann)
        and getattr(ann, "__module__", "").startswith("genjax_tpu")
    )


def _key_predicate(value: Any) -> bool:
    return checked._is_prng_key(value)


def _predicate(ann: Any, param_name: str):
    """Map an annotation to `(pred, description)` — or None when the
    annotation is not one we can enforce without false positives."""
    if ann is inspect.Parameter.empty or ann is Any:
        return None
    origin = typing.get_origin(ann)
    if origin in (Union, types.UnionType):
        parts = [
            (lambda v: v is None, "None")
            if a is type(None)
            else _predicate(a, param_name)
            for a in typing.get_args(ann)
        ]
        if any(p is None for p in parts):
            return None  # a single unenforceable arm makes the union moot
        preds = [p for p, _ in parts]
        desc = " | ".join(d for _, d in parts)
        return (lambda v: any(p(v) for p in preds), desc)
    if origin is not None:
        # Generic alias: enforce the origin only (Trace[R] -> Trace,
        # tuple[...] -> tuple). Callable aliases check callability.
        if origin is collections_abc_callable():
            return (callable, "a callable")
        if _is_framework_class(origin) or origin is tuple:
            return (
                lambda v: isinstance(v, origin),
                origin.__name__,
            )
        return None
    if ann is tuple:
        if param_name == "argdiffs":
            # Argdiffs currency: a tuple of (possibly Diff-wrapped)
            # values OR a Diff node wrapping the whole argument tuple —
            # both are handled by Diff.tree_primal throughout the edit
            # paths (e.g. Switch forwards per-branch Diff-of-tuple
            # argdiffs to its branches).
            from genjax_tpu.core.diff import Diff

            return (
                lambda v: isinstance(v, (tuple, Diff)),
                "tuple of argdiffs (or a Diff of the argument tuple)",
            )
        return (lambda v: isinstance(v, tuple), "tuple")
    if ann is jax.Array and param_name == "key":
        return (_key_predicate, "a JAX PRNG key (jax.random.key(seed))")
    if ann is jax.Array:
        # PEP-484-tower spirit: any array-like or scalar passes; only the
        # classic mistakes (dict, str, ChoiceMap, ...) are rejected.
        return (
            lambda v: isinstance(v, _ARRAYLIKE),
            "an array or scalar",
        )
    if ann in (bool, int, float):
        return (
            lambda v: isinstance(v, _ARRAYLIKE),
            f"{ann.__name__} (or an array-like)",
        )
    if _is_framework_class(ann):
        return (lambda v: isinstance(v, ann), ann.__name__)
    return None


def collections_abc_callable():
    import collections.abc

    return collections.abc.Callable


def _hint(desc: str, value: Any) -> str:
    """Fix-it suffix for the classic mistakes (mirrors the entry-point
    messages in `core/checked.py`)."""
    if desc == "tuple":
        return (
            ". Model arguments must be the argument TUPLE: use `(x,)` "
            "for a single argument, `()` for none."
        )
    if "ChoiceMap" in desc and isinstance(value, dict):
        return ". Build one with `ChoiceMap.kw(addr=value)` or `ChoiceMap.d`."
    if "Selection" in desc:
        return ". Build one with `Selection.at[addr]` / `Selection.all()`."
    return ""


def _wrap(fn: Callable, qualname: str) -> Callable:
    """Return `fn` wrapped with checked-mode validation, or `fn` itself
    when nothing on its signature is enforceable."""
    if getattr(fn, _MARK, False):
        return fn
    try:
        hints = typing.get_type_hints(fn)
        sig = inspect.signature(fn)
    except Exception:
        return fn
    # Precompute (positional_index | None, name, pred, desc) so the
    # always-on wrapper is a short isinstance loop — no `sig.bind` on
    # the hot path (that alone would triple trace-time call cost).
    checks = []
    pos = 0
    for name, param in sig.parameters.items():
        if param.kind is param.VAR_POSITIONAL:
            pos = None  # everything after *args is keyword-only
            continue
        if param.kind is param.VAR_KEYWORD:
            continue
        idx = None
        if param.kind in (param.POSITIONAL_ONLY, param.POSITIONAL_OR_KEYWORD):
            idx = pos
            if pos is not None:
                pos += 1
        pred = _predicate(hints.get(name, param.annotation), name)
        if pred is not None:
            checks.append((idx, name, pred[0], pred[1]))
    if not checks:
        return fn

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _ENABLED or checked.is_checked():
            for idx, name, pred, desc in checks:
                if idx is not None and idx < len(args):
                    v = args[idx]
                elif name in kwargs:
                    v = kwargs[name]
                else:
                    continue  # defaulted — nothing to validate
                if not pred(v):
                    raise TypeError(
                        f"{qualname}: parameter `{name}` expected "
                        f"{desc}; got {type(v).__name__}: {v!r}"
                        f"{_hint(desc, v)}"
                    )
        return fn(*args, **kwargs)

    setattr(wrapper, _MARK, True)
    return wrapper


def _instrument_class(cls: type) -> int:
    """Wrap the enforceable public methods a class itself defines.

    Inherited methods are covered when their defining class is
    instrumented (every exported concrete class is), so overrides get
    their own wrappers. Returns the number of methods wrapped."""
    n = 0
    for name, member in list(vars(cls).items()):
        if name.startswith("_"):
            continue
        qual = f"{cls.__name__}.{name}"
        if isinstance(member, staticmethod):
            wrapped = _wrap(member.__func__, qual)
            if wrapped is not member.__func__:
                setattr(cls, name, staticmethod(wrapped))
                n += 1
        elif isinstance(member, classmethod):
            wrapped = _wrap(member.__func__, qual)
            if wrapped is not member.__func__:
                setattr(cls, name, classmethod(wrapped))
                n += 1
        elif inspect.isfunction(member):
            wrapped = _wrap(member, qual)
            if wrapped is not member:
                setattr(cls, name, wrapped)
                n += 1
    return n


def instrument(module) -> int:
    """Instrument a facade module's exported API in place.

    Walks `module.__all__`: exported framework classes get their public
    methods wrapped (mutated on the class, so every alias sees the
    checks); exported plain functions are wrapped and rebound on the
    module. Idempotent. Returns the number of callables wrapped."""
    n = 0
    seen: set[int] = set()
    done_classes: set[int] = set()
    for name in getattr(module, "__all__", []):
        obj = getattr(module, name, None)
        if obj is None or id(obj) in seen:
            continue
        seen.add(id(obj))
        if inspect.isclass(obj) and _is_framework_class(obj):
            # Cover the class and every framework subclass already
            # defined (node types, combinator traces, concrete GFI
            # implementations override the exported interfaces; by the
            # time the facade calls this, all internal modules are
            # imported). User subclasses defined later are not wrapped.
            stack = [obj]
            while stack:
                cls = stack.pop()
                if id(cls) in done_classes:
                    continue
                done_classes.add(id(cls))
                n += _instrument_class(cls)
                stack.extend(
                    c for c in cls.__subclasses__() if _is_framework_class(c)
                )
        elif inspect.isfunction(obj):
            wrapped = _wrap(obj, name)
            if wrapped is not obj:
                setattr(module, name, wrapped)
                n += 1
    return n
