"""PrimitiveType coder: bit-compatible with HBase ``Bytes``
(reference: types/PrimitiveType.scala:25-122).

Encodings (big-endian throughout, like org.apache.hadoop.hbase.util.Bytes):
- boolean: one byte, ``0xFF`` for true, ``0x00`` for false
  (Bytes.toBytes(boolean) emits (byte)-1 for true)
- byte/short/int/long: two's-complement big-endian
- float:  IEEE-754 bits of the float, big-endian (Bytes.toBytes(float))
- double: IEEE-754 bits, big-endian
- string: UTF-8
- binary: passthrough

NOTE: these raw encodings are NOT order-preserving across sign —
negative ints sort byte-wise above positives, negative doubles sort
reversed. The reference handles that at filter time with 2-range
decomposition (ScanRange.scala:290-426); our embedded backend instead
defaults to the order-preserving coder (ordered.py) and keeps this one
for bit-compatibility with real HBase data.
"""

from __future__ import annotations

import struct

from pyspark.sql import types as T

from shc_spark.coders.base import Coder

_INT_FMT = {1: ">b", 2: ">h", 4: ">i", 8: ">q"}
_INT_WIDTH = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4, T.LongType: 8}


class PrimitiveType(Coder):
    order_preserving = False

    def order_preserving_for(self, dt: T.DataType) -> bool:
        # UTF-8 strings, raw binary, and 0x00/0xFF booleans sort
        # byte-wise == value-wise; signed numerics do not (the §4.2
        # sign hazard)
        return type(dt) in (T.StringType, T.BinaryType, T.BooleanType)

    def to_bytes(self, value, dt: T.DataType) -> bytes:
        if value is None:
            raise ValueError("cannot encode null (nulls are skipped on write)")
        t = type(dt)
        if t is T.BooleanType:
            return b"\xff" if value else b"\x00"
        if t in _INT_WIDTH:
            return struct.pack(_INT_FMT[_INT_WIDTH[t]], int(value))
        if t is T.FloatType:
            return struct.pack(">f", float(value))
        if t is T.DoubleType:
            return struct.pack(">d", float(value))
        if t is T.StringType:
            return str(value).encode("utf-8")
        if t is T.BinaryType:
            return bytes(value)
        raise ValueError(f"PrimitiveType cannot encode {dt}")

    def from_bytes(self, data: bytes, dt: T.DataType, offset: int = 0, length: int | None = None):
        t = type(dt)
        if length is None:
            length = len(data) - offset
        view = data[offset : offset + length]
        if t is T.BooleanType:
            return view != b"\x00"
        if t in _INT_WIDTH:
            return struct.unpack(_INT_FMT[_INT_WIDTH[t]], view)[0]
        if t is T.FloatType:
            return struct.unpack(">f", view)[0]
        if t is T.DoubleType:
            return struct.unpack(">d", view)[0]
        if t is T.StringType:
            return view.decode("utf-8")
        if t is T.BinaryType:
            return bytes(view)
        raise ValueError(f"PrimitiveType cannot decode {dt}")
