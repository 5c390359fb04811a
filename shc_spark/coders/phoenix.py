"""PhoenixType coder: Apache Phoenix PDataType-compatible encodings
(reference: types/Phoenix.scala:32-118; Phoenix semantics from the
public Phoenix type system documentation).

Phoenix encodes integers sign-bit-flipped (order-preserving) and
composite keys with ``\\x00`` separators AFTER variable-length
dimensions (RowKeySchema, Phoenix.scala:63-86) — unlike PrimitiveType,
any number of var-length dims is allowed as long as values contain no
NUL bytes.

Encodings:
- byte/short/int/long: big-endian with sign bit flipped (PInteger etc.)
- float/double: IEEE-754 with full order-preserving transform (PFloat)
- boolean: 0x00 / 0x01 (PBoolean)
- string: UTF-8 (PVarchar)
- binary: passthrough (PVarbinary)
"""

from __future__ import annotations

from pyspark.sql import types as T

from shc_spark.coders.base import Coder
from shc_spark.coders.ordered import OrderedType

_SEP = b"\x00"


class PhoenixType(Coder):
    order_preserving = True

    def __init__(self) -> None:
        self._ordered = OrderedType()

    def to_bytes(self, value, dt: T.DataType) -> bytes:
        if type(dt) is T.BooleanType:
            return b"\x01" if value else b"\x00"
        return self._ordered.to_bytes(value, dt)

    def from_bytes(self, data: bytes, dt: T.DataType, offset: int = 0, length: int | None = None):
        return self._ordered.from_bytes(data, dt, offset, length)

    def encode_rowkey(self, values: list, fields) -> bytes:
        """Var-length dims are NUL-terminated unless last
        (Phoenix.scala:63-74)."""
        parts = []
        for i, (v, f) in enumerate(zip(values, fields)):
            enc = self.to_bytes(v, f.dt)
            parts.append(enc)
            if f.var_length and i != len(fields) - 1:
                parts.append(_SEP)
        return b"".join(parts)

    def decode_rowkey(self, key: bytes, fields) -> list:
        out, offset = [], 0
        for i, f in enumerate(fields):
            if f.length is not None:
                out.append(self.from_bytes(key, f.dt, offset, f.length))
                offset += f.length
            elif i == len(fields) - 1:
                out.append(self.from_bytes(key, f.dt, offset, len(key) - offset))
                offset = len(key)
            else:
                end = key.index(_SEP, offset)
                out.append(self.from_bytes(key, f.dt, offset, end - offset))
                offset = end + 1
        return out
