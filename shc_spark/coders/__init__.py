"""Type coders: value <-> bytes serdes for cells and rowkeys.

Mirrors the reference's SHCDataType factory
(types/SHCDataType.scala:72-77): a coder is resolved by name, and
custom coders can be registered (the reference loads them by
reflection; we keep a registry plus an entry-point-style
``module:Class`` fallback).
"""

from __future__ import annotations

import importlib

from shc_spark.coders.base import Coder
from shc_spark.coders.ordered import OrderedType
from shc_spark.coders.phoenix import PhoenixType
from shc_spark.coders.primitive import PrimitiveType

_REGISTRY: dict[str, type[Coder]] = {
    "PrimitiveType": PrimitiveType,
    "OrderedType": OrderedType,
    "PhoenixType": PhoenixType,
}


def register_coder(name: str, cls: type[Coder]) -> None:
    _REGISTRY[name] = cls


def get_coder(name: str) -> Coder:
    if name in _REGISTRY:
        return _REGISTRY[name]()
    if ":" in name:  # "package.module:ClassName" custom coder
        mod, cls = name.rsplit(":", 1)
        return getattr(importlib.import_module(mod), cls)()
    raise ValueError(f"unknown coder {name!r}")
