"""Pytree dataclass machinery for the static/dynamic Model/Data split.

The reference engine's key architectural invariant is two flat structs: an
immutable ``mjModel`` (sizes + constant arrays) and a mutable ``mjData``
(state + workspace) — see /root/reference/include/mujoco/mjmodel.h:242 and
mjdata.h:99.  On TPU the natural analog is a pair of pytrees where

  * *structural* fields (sizes, type enums, index tables, topology masks) are
    host numpy arrays stored in the pytree's static aux data — changing them
    triggers retrace/recompile, exactly the semantics the reference documents
    for MJX's numpy/jax field split (/root/reference/doc/mjx.rst:380-384);
  * *numeric* fields (masses, gains, state) are jax array leaves — traced,
    donate-able, and vmappable for per-env domain randomization.

We implement this ourselves (rather than flax.struct) so static numpy arrays
can live in aux data with a cheap precomputed hash: jit compares aux data on
every call, so equality must be fast and hashable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import numpy as np

T = TypeVar("T")

_STATIC_FLAG = "__mjtpu_static__"


def static_field(**kwargs):
  """Field stored in pytree aux data (host-side, retrace on change)."""
  metadata = dict(kwargs.pop("metadata", {}) or {})
  metadata[_STATIC_FLAG] = True
  return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs):
  """Field stored as a pytree leaf (traced jax array)."""
  return dataclasses.field(**kwargs)


class _FrozenArray:
  """Hashable wrapper for numpy arrays living in static aux data."""

  __slots__ = ("a", "_hash")

  def __init__(self, a: np.ndarray):
    self.a = a
    self._hash = hash((a.shape, str(a.dtype), a.tobytes()))

  def __hash__(self):
    return self._hash

  def __eq__(self, other):
    if not isinstance(other, _FrozenArray):
      return NotImplemented
    if self._hash != other._hash:
      return False
    return self.a.shape == other.a.shape and np.array_equal(self.a, other.a)


class _FrozenDict:
  """Hashable marker wrapper so dict-valued static fields roundtrip."""

  __slots__ = ("items",)

  def __init__(self, items):
    self.items = items

  def __hash__(self):
    return hash(self.items)

  def __eq__(self, other):
    if not isinstance(other, _FrozenDict):
      return NotImplemented
    return self.items == other.items


def _freeze(v: Any) -> Any:
  if isinstance(v, np.ndarray):
    return _FrozenArray(v)
  if isinstance(v, (list, tuple)):
    return tuple(_freeze(x) for x in v)
  if isinstance(v, dict):
    return _FrozenDict(tuple(sorted((k, _freeze(x)) for k, x in v.items())))
  return v


def _thaw(v: Any) -> Any:
  if isinstance(v, _FrozenArray):
    return v.a
  if isinstance(v, _FrozenDict):
    return {k: _thaw(x) for k, x in v.items}
  if isinstance(v, tuple):
    return tuple(_thaw(x) for x in v)
  return v


def pytree_dataclass(cls: type[T]) -> type[T]:
  """Register a frozen dataclass as a jax pytree with static-field support."""
  cls = dataclasses.dataclass(frozen=True)(cls)

  leaf_names = []
  static_names = []
  for f in dataclasses.fields(cls):
    if f.metadata.get(_STATIC_FLAG, False):
      static_names.append(f.name)
    else:
      leaf_names.append(f.name)

  def flatten_with_keys(obj):
    leaves = [(jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in leaf_names]
    aux = tuple(_freeze(getattr(obj, n)) for n in static_names)
    return leaves, aux

  def unflatten(aux, leaves):
    kw = dict(zip(leaf_names, leaves))
    kw.update({n: _thaw(v) for n, v in zip(static_names, aux)})
    return cls(**kw)

  def flatten(obj):
    children, aux = flatten_with_keys(obj)
    return [c for _, c in children], aux

  jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten,
                                          flatten)

  def replace(self, **updates):
    return dataclasses.replace(self, **updates)

  cls.replace = replace
  cls.__mjtpu_leaf_fields__ = tuple(leaf_names)
  cls.__mjtpu_static_fields__ = tuple(static_names)
  return cls
