"""OrderedType coder: order-preserving byte encodings.

The fix the reference never made (SURVEY.md §7.2): with raw
two's-complement / IEEE-754 encodings, numeric order != byte order, so
the reference decomposes every comparison into up to 2 byte ranges
(ScanRange.scala:290-426, the "sign-split"). Flipping the sign bit for
integers and applying the standard sign-magnitude transform for floats
makes lexicographic byte order equal numeric order — one range per
comparison, no special cases, and 100 TB range-pruning stays a simple
interval intersection.

- int family: ``v XOR MIN_VALUE`` (flip top bit), big-endian
- float/double: if sign bit clear, flip sign bit; else flip ALL bits
- boolean: 0x00 false / 0x01 true
- string: UTF-8 (already order-preserving for code-point order)
- binary: passthrough
"""

from __future__ import annotations

import struct

from pyspark.sql import types as T

from shc_spark.coders.base import Coder

_WIDTH = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4, T.LongType: 8}


class OrderedType(Coder):
    order_preserving = True

    def to_bytes(self, value, dt: T.DataType) -> bytes:
        if value is None:
            raise ValueError("cannot encode null")
        t = type(dt)
        if t is T.BooleanType:
            return b"\x01" if value else b"\x00"
        if t in _WIDTH:
            w = _WIDTH[t]
            bits = int(value) & ((1 << (8 * w)) - 1)
            bits ^= 1 << (8 * w - 1)  # flip sign bit
            return bits.to_bytes(w, "big")
        if t is T.FloatType:
            # -0.0 + 0.0 == +0.0: normalize so keys Spark compares as
            # EQUAL encode identically (else key == 0.0 pushdown would
            # silently miss rows stored with -0.0)
            bits = struct.unpack(">I", struct.pack(">f", float(value) + 0.0))[0]
            bits = bits ^ 0x80000000 if not (bits & 0x80000000) else bits ^ 0xFFFFFFFF
            return struct.pack(">I", bits)
        if t is T.DoubleType:
            bits = struct.unpack(">Q", struct.pack(">d", float(value) + 0.0))[0]
            bits = (
                bits ^ 0x8000000000000000
                if not (bits & 0x8000000000000000)
                else bits ^ 0xFFFFFFFFFFFFFFFF
            )
            return struct.pack(">Q", bits)
        if t is T.StringType:
            return str(value).encode("utf-8")
        if t is T.BinaryType:
            return bytes(value)
        raise ValueError(f"OrderedType cannot encode {dt}")

    def from_bytes(self, data: bytes, dt: T.DataType, offset: int = 0, length: int | None = None):
        t = type(dt)
        if length is None:
            length = len(data) - offset
        view = data[offset : offset + length]
        if t is T.BooleanType:
            return view != b"\x00"
        if t in _WIDTH:
            w = _WIDTH[t]
            bits = int.from_bytes(view, "big") ^ (1 << (8 * w - 1))
            if bits & (1 << (8 * w - 1)):
                bits -= 1 << (8 * w)
            return bits
        if t is T.FloatType:
            bits = struct.unpack(">I", view)[0]
            bits = bits ^ 0x80000000 if bits & 0x80000000 else bits ^ 0xFFFFFFFF
            return struct.unpack(">f", struct.pack(">I", bits))[0]
        if t is T.DoubleType:
            bits = struct.unpack(">Q", view)[0]
            bits = (
                bits ^ 0x8000000000000000
                if bits & 0x8000000000000000
                else bits ^ 0xFFFFFFFFFFFFFFFF
            )
            return struct.unpack(">d", struct.pack(">Q", bits))[0]
        if t is T.StringType:
            return view.decode("utf-8")
        if t is T.BinaryType:
            return bytes(view)
        raise ValueError(f"OrderedType cannot decode {dt}")
