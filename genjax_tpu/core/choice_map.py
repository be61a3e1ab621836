"""Addressed sample storage: `ChoiceMap` and the `Selection` address algebra.

Capability parity with reference `_src/core/generative/choice_map.py`
(1786 LoC): the full Selection algebra (all/none/leaf/complement/static-
prefix/and/or/wildcard `...`/choicemap-derived), the ChoiceMap node types
(`Choice`, `Indexed`, `Static`, `Switch`, `Or`), builders (`C["x"].set(v)`),
constructors (`choice/entry/from_mapping/d/kw/switch`), combinators
(`filter`, `mask`, `extend`, `merge`, `|`, `&`, `+`), dynamic integer-array
addressing, and `invalid_subset` support detection.

TPU-first design notes
----------------------
* All leaf storage is dense arrays; dynamic-address access lowers to
  gathers + `Mask` flags (never data-dependent control flow).
* Vectorized choice maps are ordinary `Static` tries whose leaves carry
  batch dimensions (produced by `vmap`-ing trace construction); per-index
  lookup is a leaf-wise gather.
* The trie structure itself is static metadata (dict keys live in the
  treedef), so address resolution costs nothing at runtime.
"""

import functools
from collections.abc import Iterable
from dataclasses import dataclass
from operator import or_
from types import EllipsisType
from typing import Any, Generic, TypeVar

import jax.numpy as jnp
import jax.tree_util as jtu
from jax import Array

from genjax_tpu.core.mask import Mask
from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.staging import FlagOp
from genjax_tpu.core.typing import Flag, IntArray, static_check_is_concrete

T = TypeVar("T")
K_addr = TypeVar("K_addr")

# -- address vocabulary ------------------------------------------------------

StaticAddressComponent = str
DynamicAddressComponent = int | slice | Array
AddressComponent = StaticAddressComponent | DynamicAddressComponent
Address = AddressComponent | tuple[AddressComponent, ...]
StaticAddress = StaticAddressComponent | tuple[StaticAddressComponent, ...]
ExtendedStaticAddressComponent = StaticAddressComponent | EllipsisType
ExtendedStaticAddress = (
    ExtendedStaticAddressComponent | tuple[ExtendedStaticAddressComponent, ...]
)

_full_slice = slice(None, None, None)


def _is_scalar_component(comp) -> bool:
    return isinstance(comp, int) or (isinstance(comp, Array) and comp.ndim == 0)


def _is_full_slice(comp) -> bool:
    return isinstance(comp, slice) and comp == _full_slice


def _validate_addr(
    addr: tuple[AddressComponent, ...], allow_partial_slice: bool = False
) -> tuple[AddressComponent, ...]:
    """Check the shape grammar of an address's dynamic components.

    Static string components are transparent. The dynamic components must
    match, in order: a run of scalars (ints / 0-d arrays); at most one
    "fan-out" component (a non-scalar index array — or a partial slice
    when `allow_partial_slice`); then only full slices. This is a
    single-pass state machine; anything else cannot be resolved against
    dense leaf storage in one gather (capability parity with reference
    `choice_map.py:699-749`, independently re-derived from the gather
    grammar).
    """
    in_scalar_prefix = True
    for comp in addr:
        if isinstance(comp, (StaticAddressComponent, EllipsisType)):
            # Strings are trie keys; `...` indexes every leaf identically.
            continue
        if in_scalar_prefix:
            if _is_scalar_component(comp):
                continue
            in_scalar_prefix = False
            # This component occupies the single fan-out slot if eligible.
            if isinstance(comp, Array):
                continue
            if allow_partial_slice and isinstance(comp, slice) and not _is_full_slice(comp):
                continue
            # Not fan-out-eligible: must already be a trailing full slice.
        if not _is_full_slice(comp):
            grammar = (
                "scalars, then at most one index array or partial slice, "
                "then full slices"
                if allow_partial_slice
                else "scalars, then full slices"
            )
            raise ValueError(
                f"Unresolvable dynamic address {addr!r}: expected {grammar}; "
                f"component {comp!r} breaks the grammar."
            )
    return addr


##############
# Selections #
##############


class _SelectionBuilder:
    @property
    def all(self) -> "Selection":
        return Selection.all()

    @property
    def none(self) -> "Selection":
        return Selection.none()

    @property
    def leaf(self) -> "Selection":
        return Selection.leaf()

    def __getitem__(self, addr: ExtendedStaticAddress) -> "Selection":
        # Subtree semantics (reference `choice_map.py:112-117`): S[p]
        # selects p and every address beneath it, so selecting a submodel
        # address covers the submodel's whole choice subtree. S[()] is
        # the this-node-only leaf selection.
        addr = addr if isinstance(addr, tuple) else (addr,)
        if addr == ():
            return Selection.leaf()
        return Selection.all().extend(*addr)


class Selection(Pytree):
    """An address-set algebra over choice map addresses.

    Supports union (`|`), intersection (`&`), complement (`~`), nesting
    (`extend`), and querying: `sel(addr)` returns the sub-selection, while
    `sel[addr]` / `addr in sel` return whether the address is selected.
    The wildcard `...` matches zero or one address components (so
    `S[..., "z"]` addresses both a vectorized trie's flat `"z"` leaves and
    the positional `(step, "z")` space of `Scan`/`Vmap` edits).

    >>> from genjax_tpu import SelectionBuilder as S
    >>> sel = S["x"] | S["sub", "y"]
    >>> "x" in sel
    True
    >>> ("sub", "y") in sel
    True
    >>> ("sub", "z") in sel
    False
    >>> "x" in ~sel
    False
    >>> ("q", "z") in S[..., "z"]  # wildcard matches the one level "q"
    True
    """

    # `Selection.at` builder is assigned after the class definition (kept out
    # of the class body so dataclass subclasses don't pick it up as a field).

    @staticmethod
    def all() -> "Selection":
        return AllSel()

    @staticmethod
    def none() -> "Selection":
        return NoneSel()

    @staticmethod
    def leaf() -> "Selection":
        return LeafSel()

    # -- combinators ---------------------------------------------------------

    def __or__(self, other: "Selection") -> "Selection":
        return OrSel.build(self, other)

    def __and__(self, other: "Selection") -> "Selection":
        return AndSel.build(self, other)

    def __invert__(self) -> "Selection":
        return ComplementSel.build(self)

    def complement(self) -> "Selection":
        return ~self

    def filter(self, sample: "ChoiceMap") -> "ChoiceMap":
        return sample.filter(self)

    def extend(self, *addrs: ExtendedStaticAddressComponent) -> "Selection":
        acc = self
        for addr in reversed(addrs):
            acc = StaticSel.build(acc, addr)
        return acc

    # -- querying -------------------------------------------------------------

    def __call__(self, addr: StaticAddress) -> "Selection":
        addr = addr if isinstance(addr, tuple) else (addr,)
        sub = self
        for comp in addr:
            sub = sub.get_subselection(comp)
        return sub

    def __getitem__(self, addr: StaticAddress) -> bool:
        return self(addr).check()

    def __contains__(self, addr: StaticAddress) -> bool:
        return self[addr]

    def check(self) -> Flag:
        raise NotImplementedError

    def get_subselection(self, addr) -> "Selection":
        raise NotImplementedError


@Pytree.dataclass(match_args=True)
class AllSel(Selection):
    def check(self) -> Flag:
        return True

    def get_subselection(self, addr) -> Selection:
        return self


@Pytree.dataclass(match_args=True)
class NoneSel(Selection):
    def check(self) -> Flag:
        return False

    def get_subselection(self, addr) -> Selection:
        return self


@Pytree.dataclass
class LeafSel(Selection):
    def check(self) -> Flag:
        return True

    def get_subselection(self, addr) -> Selection:
        return Selection.none()


@Pytree.dataclass(match_args=True)
class ComplementSel(Selection):
    s: Selection

    @staticmethod
    def build(s: Selection) -> Selection:
        match s:
            case AllSel():
                return Selection.none()
            case NoneSel():
                return Selection.all()
            case ComplementSel():
                return s.s
            case _:
                return ComplementSel(s)

    def check(self) -> Flag:
        return FlagOp.not_(self.s.check())

    def get_subselection(self, addr) -> Selection:
        return ~self.s(addr)


@Pytree.dataclass(match_args=True)
class StaticSel(Selection):
    s: Selection = Pytree.field()
    addr: ExtendedStaticAddressComponent = Pytree.static()

    @staticmethod
    def build(s: Selection, addr: ExtendedStaticAddressComponent) -> Selection:
        match s:
            case NoneSel():
                return s
            case _:
                return StaticSel(s, addr)

    def check(self) -> Flag:
        if isinstance(self.addr, EllipsisType):
            # `...` matches zero-or-one levels (see get_subselection), so a
            # wildcard selection is checked against its inner selection.
            return self.s.check()
        return False

    def get_subselection(self, addr) -> Selection:
        if isinstance(self.addr, EllipsisType):
            # The wildcard matches ZERO or ONE address components. The
            # zero-level branch (`self.s(addr)`) reconciles the two views
            # of vectorized traces: `Scan`/`Vmap` edits address steps
            # positionally ((idx, "z") — the wildcard consumes idx), while
            # their choice tries store "z" with batched leaves and no index
            # level (filter/HMC-style access — the wildcard matches
            # nothing). `S[..., "z"]` therefore works uniformly in both.
            return OrSel.build(self.s, self.s(addr))
        if isinstance(addr, EllipsisType):
            return self.s
        if not static_check_is_concrete(addr):
            # Traced address component (e.g. the step index inside
            # `lax.scan` when a combinator slices a per-index selection):
            # a string-keyed selection can never match an integer level;
            # an integer-keyed one matches under a traced flag.
            if isinstance(self.addr, StaticAddressComponent):
                return Selection.none()
            return MaskedSel.build(self.s, jnp.asarray(addr) == self.addr)
        if isinstance(addr, Array):
            # Concrete 0-d array: compare by value against integer keys.
            if isinstance(self.addr, StaticAddressComponent):
                return Selection.none()
            return (
                self.s if bool(jnp.asarray(addr) == self.addr) else Selection.none()
            )
        if addr == self.addr:
            return self.s
        return Selection.none()


@Pytree.dataclass(match_args=True)
class MaskedSel(Selection):
    """A selection gated by a (possibly traced) Boolean flag.

    Produced when an integer-keyed selection (`S[1, "x"]`) is queried with
    a traced index — e.g. when `Scan`/`Vmap` slice the selection per step
    inside `lax.scan`/`vmap`. Consumers observe a traced `check()` and
    lower to dense selects (`Distribution.edit_regenerate`,
    `Distribution.project`)."""

    s: Selection
    flag: Flag

    @staticmethod
    def build(s: Selection, flag: Flag) -> Selection:
        if FlagOp.concrete_true(flag):
            return s
        if FlagOp.concrete_false(flag):
            return Selection.none()
        if isinstance(s, NoneSel):
            return s
        return MaskedSel(s, flag)

    def check(self) -> Flag:
        return FlagOp.and_(self.flag, self.s.check())

    def get_subselection(self, addr) -> Selection:
        return MaskedSel.build(self.s(addr), self.flag)


@Pytree.dataclass(match_args=True)
class AndSel(Selection):
    s1: Selection
    s2: Selection

    @staticmethod
    def build(a: Selection, b: Selection) -> Selection:
        match (a, b):
            case (AllSel(), _):
                return b
            case (_, AllSel()):
                return a
            case (NoneSel(), _):
                return a
            case (_, NoneSel()):
                return b
            case (a, b) if a == b:
                return a
            case _:
                return AndSel(a, b)

    def check(self) -> Flag:
        return FlagOp.and_(self.s1.check(), self.s2.check())

    def get_subselection(self, addr) -> Selection:
        return self.s1(addr) & self.s2(addr)


@Pytree.dataclass(match_args=True)
class OrSel(Selection):
    s1: Selection
    s2: Selection

    @staticmethod
    def build(a: Selection, b: Selection) -> Selection:
        match (a, b):
            case (AllSel(), _):
                return a
            case (_, AllSel()):
                return b
            case (NoneSel(), _):
                return b
            case (_, NoneSel()):
                return a
            case (a, b) if a == b:
                return a
            case _:
                return OrSel(a, b)

    def check(self) -> Flag:
        return FlagOp.or_(self.s1.check(), self.s2.check())

    def get_subselection(self, addr) -> Selection:
        return self.s1(addr) | self.s2(addr)


@Pytree.dataclass(match_args=True)
class ChmSel(Selection):
    c: "ChoiceMap"

    @staticmethod
    def build(chm: "ChoiceMap") -> Selection:
        if chm.static_is_empty():
            return Selection.none()
        return ChmSel(chm)

    def check(self) -> Flag:
        v = self.c.get_value()
        if v is None:
            return False
        if isinstance(v, Mask):
            return v.primal_flag()
        return True

    def get_subselection(self, addr) -> Selection:
        return self.c.get_inner_map(addr).get_selection()


def statically_unmatchable_at_index_level(sel: Selection) -> bool:
    """True when `sel(i)` is statically `NoneSel` for EVERY integer index
    `i` — i.e. the selection cannot address into an indexed address space
    (a `Scan` step level or `Vmap` lane level). `Scan`/`Vmap` raise on such
    selections instead of silently regenerating/projecting nothing; use
    `Selection.at[..., "addr"]` (wildcard over the index) or
    `Selection.at[i, "addr"]` (a specific index) there."""
    match sel:
        case NoneSel():
            return True
        case AllSel() | LeafSel():
            return False
        case StaticSel(_, addr):
            # A string key can never match an integer index level.
            return isinstance(addr, StaticAddressComponent)
        case OrSel(s1, s2):
            return statically_unmatchable_at_index_level(
                s1
            ) and statically_unmatchable_at_index_level(s2)
        case AndSel(s1, s2):
            return statically_unmatchable_at_index_level(
                s1
            ) or statically_unmatchable_at_index_level(s2)
        case MaskedSel(s, _):
            return statically_unmatchable_at_index_level(s)
        case _:
            # ComplementSel / ChmSel / unknown: cannot decide statically.
            return False


SelectionBuilder = _SelectionBuilder()
Selection.at = SelectionBuilder


###############
# Choice maps #
###############


@dataclass(frozen=True)
class ChoiceMapNoValueAtAddress(Exception):
    subaddr: Any


class _ChoiceMapBuilder:
    def __init__(self, choice_map: "ChoiceMap | None", addrs: list):
        self.choice_map = choice_map
        self.addrs = addrs

    def __getitem__(self, addr: Address) -> "_ChoiceMapBuilder":
        addr = addr if isinstance(addr, tuple) else (addr,)
        return _ChoiceMapBuilder(self.choice_map, [*self.addrs, *addr])

    def set(self, v) -> "ChoiceMap":
        addrs = _validate_addr(tuple(self.addrs), allow_partial_slice=False)
        chm = ChoiceMap.entry(v, *addrs)
        if self.choice_map is None:
            return chm
        return chm + self.choice_map

    def update(self, f) -> "ChoiceMap":
        if self.choice_map is None:
            return self.set(f(_empty))
        submap = self.choice_map(tuple(self.addrs))
        if submap.has_value():
            return self.set(f(submap.get_value()))
        return self.set(f(submap))

    def n(self) -> "ChoiceMap":
        return _empty

    def v(self, v) -> "ChoiceMap":
        return self.set(ChoiceMap.choice(v))

    def from_mapping(self, mapping) -> "ChoiceMap":
        return self.set(ChoiceMap.from_mapping(mapping))

    def d(self, d: dict) -> "ChoiceMap":
        return self.set(ChoiceMap.d(d))

    def kw(self, **kwargs) -> "ChoiceMap":
        return self.set(ChoiceMap.kw(**kwargs))

    def switch(self, idx, chms) -> "ChoiceMap":
        return self.set(ChoiceMap.switch(idx, chms))


class ChoiceMap(Pytree):
    """A functional trie of addressed random choices.

    Addresses mix static string components (trie dict keys — free at
    runtime) and dynamic integer-array components (dense gathers + Mask).

    >>> import jax.numpy as jnp
    >>> from genjax_tpu import ChoiceMap, SelectionBuilder as S
    >>> chm = ChoiceMap.kw(x=1.0) | ChoiceMap.d({("sub", "y"): 2.0})
    >>> float(chm["x"])
    1.0
    >>> float(chm["sub", "y"])
    2.0
    >>> ("sub", "y") in chm
    True
    >>> kept = chm.filter(S["x"])
    >>> "x" in kept, ("sub", "y") in kept
    (True, False)

    The builder nests values at arbitrary addresses, and `|` merges with
    left priority:

    >>> C = ChoiceMap.builder
    >>> c = C["a", "b"].set(3.0) | C["a", "b"].set(4.0)
    >>> float(c["a", "b"])
    3.0

    Dynamic integer addresses store densely and answer membership with
    `Mask` flags:

    >>> c = C[jnp.array([2, 5]), "v"].set(jnp.array([10.0, 20.0]))
    >>> sub = c.get_submap(5, "v").get_value()
    >>> bool(sub.primal_flag()), float(sub.value)
    (True, 20.0)
    """

    # -- abstract interface ----------------------------------------------------

    def filter(self, selection: "Selection | Flag") -> "ChoiceMap":
        raise NotImplementedError

    def get_value(self) -> Any:
        raise NotImplementedError

    def get_inner_map(self, addr: AddressComponent) -> "ChoiceMap":
        raise NotImplementedError

    # -- derived interface -------------------------------------------------------

    def get_submap(self, *addresses: Address) -> "ChoiceMap":
        addr = tuple(
            label
            for a in addresses
            for label in (a if isinstance(a, tuple) else (a,))
        )
        addr = _validate_addr(addr, allow_partial_slice=True)
        return functools.reduce(lambda chm, comp: chm.get_inner_map(comp), addr, self)

    def has_value(self) -> bool:
        return self.get_value() is not None

    # -- constructors ---------------------------------------------------------------
    # (`ChoiceMap.builder` is assigned after the class definition.)

    @staticmethod
    def empty() -> "ChoiceMap":
        return _empty

    @staticmethod
    def choice(v: Any) -> "ChoiceMap":
        return Choice.build(v)

    @staticmethod
    def value(v: Any) -> "ChoiceMap":
        return Choice.build(v)

    @staticmethod
    def entry(v, *addrs: AddressComponent) -> "ChoiceMap":
        if isinstance(v, ChoiceMap):
            chm = v
        elif isinstance(v, dict):
            chm = ChoiceMap.d(v)
        else:
            chm = ChoiceMap.choice(v)
        return chm.extend(*addrs)

    @staticmethod
    def from_mapping(pairs: Iterable[tuple[Any, Any]]) -> "ChoiceMap":
        acc = ChoiceMap.empty()
        for addr, v in pairs:
            addr = addr if isinstance(addr, tuple) else (addr,)
            acc |= ChoiceMap.entry(v, *addr)
        return acc

    @staticmethod
    def d(d: dict) -> "ChoiceMap":
        return ChoiceMap.from_mapping(d.items())

    @staticmethod
    def kw(**kwargs) -> "ChoiceMap":
        return ChoiceMap.d(kwargs)

    @staticmethod
    def switch(idx: IntArray, chms: Iterable["ChoiceMap"]) -> "ChoiceMap":
        return Switch.build(idx, chms)

    # -- combinators ---------------------------------------------------------------

    def mask(self, flag: Flag) -> "ChoiceMap":
        return self.filter(flag)

    def extend(self, *addrs: AddressComponent) -> "ChoiceMap":
        acc = self
        for addr in reversed(addrs):
            if isinstance(addr, StaticAddressComponent):
                acc = Static.build({addr: acc})
            else:
                acc = Indexed.build(acc, addr)
        return acc

    def merge(self, other: "ChoiceMap") -> "ChoiceMap":
        return self | other

    def get_selection(self) -> Selection:
        return ChmSel.build(self)

    def static_is_empty(self) -> bool:
        return False

    # -- dunders ------------------------------------------------------------------

    def __or__(self, other: "ChoiceMap") -> "ChoiceMap":
        return Or.build(self, other)

    def __xor__(self, other: "ChoiceMap") -> "ChoiceMap":
        return self | other

    def __and__(self, other: "ChoiceMap") -> "ChoiceMap":
        return other.filter(self.get_selection())

    def __add__(self, other: "ChoiceMap") -> "ChoiceMap":
        return self | other

    def __call__(self, *addresses: Address) -> "ChoiceMap":
        return self.get_submap(*addresses)

    def __getitem__(self, addr: Address):
        submap = self.get_submap(addr)
        v = submap.get_value()
        if v is None:
            raise ChoiceMapNoValueAtAddress(addr)
        return v

    def __contains__(self, addr: Address) -> bool:
        return self.get_submap(addr).has_value()

    @property
    def at(self) -> _ChoiceMapBuilder:
        return _ChoiceMapBuilder(self, [])

    def invalid_subset(self, gen_fn, args) -> "ChoiceMap | None":
        """Return the sub-choicemap whose addresses are not reachable in
        `gen_fn(*args)`'s execution, or None if all addresses are valid."""
        shape_chm = gen_fn.get_zero_trace(*args).get_choices()
        shape_sel = _shape_selection(shape_chm)
        extras = self.filter(~shape_sel)
        if not extras.static_is_empty():
            return extras
        return None


@Pytree.dataclass(match_args=True)
class Choice(Generic[T], ChoiceMap):
    """A choice map holding a single value at the root."""

    v: T

    @staticmethod
    def build(v: T) -> ChoiceMap:
        if isinstance(v, Array) and v.shape == (0,):
            return ChoiceMap.empty()
        if isinstance(v, Mask):
            flag = v.primal_flag()
            if flag is False:
                return ChoiceMap.empty()
            if flag is True:
                return Choice(v.value)
            return Choice(v)
        return Choice(v)

    def filter(self, selection: Selection | Flag) -> ChoiceMap:
        if isinstance(selection, Selection):
            check = selection.check()
            if FlagOp.concrete_true(check):
                return self
            if FlagOp.concrete_false(check):
                return ChoiceMap.empty()
            # Traced selection check (MaskedSel / masked ChmSel): keep the
            # value behind a traced Mask flag.
            return Choice.build(Mask.build(self.v, check))
        masked = Mask.build(self.v, selection)
        return Choice.build(masked)

    def get_value(self) -> T:
        return self.v

    def get_inner_map(self, addr: AddressComponent) -> ChoiceMap:
        if isinstance(addr, StaticAddressComponent):
            return ChoiceMap.empty()
        return jtu.tree_map(
            lambda v: v[addr], self, is_leaf=lambda x: isinstance(x, Mask)
        )


@Pytree.dataclass(match_args=True)
class Indexed(ChoiceMap):
    """A choice map nested under a dynamic (integer-array) address."""

    c: ChoiceMap
    addr: IntArray

    @staticmethod
    def build(chm: ChoiceMap, addr: DynamicAddressComponent) -> ChoiceMap:
        if chm.static_is_empty():
            return chm
        if isinstance(addr, slice):
            if addr == _full_slice:
                return chm
            raise ValueError(f"Partial slices not supported: {addr}")
        if isinstance(addr, Array) and addr.shape == (0,):
            return ChoiceMap.empty()
        return Indexed(chm, addr)

    def filter(self, selection: Selection | Flag) -> ChoiceMap:
        return self.c.filter(selection).extend(self.addr)

    def get_value(self) -> Any:
        return None

    def get_inner_map(self, addr: AddressComponent) -> ChoiceMap:
        if isinstance(addr, StaticAddressComponent):
            return ChoiceMap.empty()

        if not isinstance(addr, slice):
            assert not jnp.asarray(addr, copy=False).shape, (
                "Only scalar dynamic addresses are supported by get_submap."
            )

        if isinstance(self.addr, Array) and self.addr.shape:
            assert not isinstance(addr, slice), (
                "Slices are not allowed against array-shaped dynamic "
                f"addresses. Tried to apply {addr} to {self.addr}."
            )
            check = self.addr == addr
            # Single gather: find the matching position (or junk slot 0
            # masked False).
            idx = jnp.argwhere(check, size=1, fill_value=0)[0, 0]
            return jtu.tree_map(
                lambda v: Mask.build(v[idx], check[idx]),
                self.c,
                is_leaf=lambda x: isinstance(x, Mask),
            )

        return self.c.mask(self.addr == addr)


@Pytree.dataclass(match_args=True)
class Static(ChoiceMap):
    """A static trie node: dict of address component -> sub choice map.

    The dict keys are static metadata (treedef), so address resolution is
    free at runtime; only leaf arrays are traced.
    """

    mapping: dict

    @staticmethod
    def build(d: dict) -> "Static":
        def unwrap(sub):
            if isinstance(sub, Static):
                return sub.mapping
            return sub

        return Static({k: unwrap(v) for k, v in d.items() if not v.static_is_empty()})

    @staticmethod
    def merge_with(merge, c1: "Static", c2: "Static") -> ChoiceMap:
        merged = {}
        for key in c1.mapping.keys() | c2.mapping.keys():
            if key in c1.mapping and key in c2.mapping:
                merged[key] = merge(c1.get_submap(key), c2.get_submap(key))
            elif key in c1.mapping:
                merged[key] = c1.get_submap(key)
            else:
                merged[key] = c2.get_submap(key)
        return Static.build(merged)

    def filter(self, selection: Selection | Flag) -> ChoiceMap:
        def to_subsel(addr):
            if isinstance(selection, Selection):
                return selection(addr)
            return selection

        return Static.build({
            addr: self.get_submap(addr).filter(to_subsel(addr))
            for addr in self.mapping.keys()
        })

    def get_value(self) -> Any:
        return None

    def get_inner_map(self, addr: AddressComponent) -> ChoiceMap:
        if isinstance(addr, StaticAddressComponent):
            v = self.mapping.get(addr, {})
            return Static(v) if isinstance(v, dict) else v
        return jtu.tree_map(
            lambda v: v[addr], self, is_leaf=lambda x: isinstance(x, Mask)
        )

    def static_is_empty(self) -> bool:
        return len(self.mapping) == 0


@Pytree.dataclass(match_args=True)
class Switch(ChoiceMap):
    """Index-masked union of several choice maps: branch `i` is masked by
    `idx == i`."""

    idx: IntArray
    chms: list[ChoiceMap]

    @staticmethod
    def build(idx, chm_iter: Iterable[ChoiceMap]) -> ChoiceMap:
        if isinstance(idx, int):
            return list(chm_iter)[idx]
        chms = [chm.mask(i == idx) for i, chm in enumerate(chm_iter)]
        return Switch(idx, chms)

    def filter(self, selection: Selection | Flag) -> ChoiceMap:
        return Switch(self.idx, [chm.filter(selection) for chm in self.chms])

    def get_value(self) -> Any:
        vs = [chm.get_value() for chm in self.chms]
        entries = [Mask.build(v) for v in vs if v is not None]
        return Mask.or_n(*entries) if entries else None

    def get_inner_map(self, addr: AddressComponent) -> ChoiceMap:
        return Switch(self.idx, [chm.get_inner_map(addr) for chm in self.chms])


@Pytree.dataclass(match_args=True)
class Or(ChoiceMap):
    """Left-prioritized union of two choice maps."""

    c1: ChoiceMap
    c2: ChoiceMap

    @staticmethod
    def build(c1: ChoiceMap, c2: ChoiceMap) -> ChoiceMap:
        if c2.static_is_empty():
            return c1
        if c1.static_is_empty():
            return c2
        match (c1, c2):
            case (Static(), Static()):
                return Static.merge_with(or_, c1, c2)
            case (Choice(a), Choice(b)):
                a = Mask.build(a)
                b = Mask.build(b)
                return Choice.build(a | b)
            case (Switch(), Switch()):
                # Two index-masked unions: keep the generic left-priority
                # node (get_value/get_inner_map distribute correctly).
                return Or(c1, c2)
            case (Switch(idx, chms), _):
                return Switch.build(idx, [sub | c2 for sub in chms])
            case (_, Switch(idx, chms)):
                return Switch.build(idx, [c1 | sub for sub in chms])
            case _:
                # Heterogeneous overlap (leaf vs subtree, masked leaf vs
                # trie, …): the generic node applies left priority lazily.
                return Or(c1, c2)

    def filter(self, selection: Selection | Flag) -> ChoiceMap:
        return self.c1.filter(selection) | self.c2.filter(selection)

    def get_value(self) -> Any:
        v1 = self.c1.get_value()
        v2 = self.c2.get_value()
        if v1 is None:
            return v2
        if v2 is None:
            return v1
        m = Mask.build(v1) | Mask.build(v2)
        flag = m.primal_flag()
        return m.value if flag is True else m

    def get_inner_map(self, addr: AddressComponent) -> ChoiceMap:
        return self.c1.get_inner_map(addr) | self.c2.get_inner_map(addr)


def _shape_selection(chm: ChoiceMap) -> Selection:
    """Build the selection of all addresses reachable in `chm`'s structure
    (used by `invalid_subset`)."""

    def loop(inner: ChoiceMap, selection: Selection) -> Selection:
        match inner:
            case Static(mapping):
                acc = Selection.none()
                for addr in mapping.keys():
                    sub_chm = inner.get_submap(addr)
                    sub_sel = selection(addr)
                    acc |= loop(sub_chm, sub_sel).extend(addr)
                return acc
            case Indexed(c, _):
                return loop(c, selection).extend(...)
            case Choice():
                return LeafSel()
            case Or(c1, c2):
                return loop(c1, selection) | loop(c2, selection)
            case Switch(_, chms):
                acc = loop(chms[0], selection)
                for sub in chms[1:]:
                    acc |= loop(sub, selection)
                return acc
            case _:
                raise ValueError(f"Unknown ChoiceMap type: {type(inner)}")

    return loop(chm, Selection.all())


_empty = Static({})
ChoiceMapBuilder = _ChoiceMapBuilder(_empty, [])
ChoiceMap.builder = _ChoiceMapBuilder(None, [])
