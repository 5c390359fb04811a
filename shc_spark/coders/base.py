"""Coder protocol (the reference's SHCDataType trait,
types/SHCDataType.scala:25-60): encode/decode one typed value, plus
composite-rowkey encode/decode for coders that support it."""

from __future__ import annotations

from pyspark.sql import types as T


class Coder:
    """value <-> bytes for a single cell / rowkey dimension."""

    #: whether byte-wise lexicographic order of encodings equals value order
    order_preserving: bool = False

    def order_preserving_for(self, dt: T.DataType) -> bool:
        """Order preservation is per (coder, dtype): e.g. HBase-raw
        PrimitiveType strings/binary/boolean sort correctly but the
        int family and floats do NOT (sign bit)."""
        return self.order_preserving

    def to_bytes(self, value, dt: T.DataType) -> bytes:
        raise NotImplementedError

    def from_bytes(self, data: bytes, dt: T.DataType, offset: int = 0, length: int | None = None):
        raise NotImplementedError

    # -- composite rowkey ------------------------------------------------
    def encode_rowkey(self, values: list, fields) -> bytes:
        """Concatenate encoded dimensions (PrimitiveType.scala:74-113)."""
        return b"".join(self.to_bytes(v, f.dt) for v, f in zip(values, fields))

    def decode_rowkey(self, key: bytes, fields) -> list:
        """Fixed-width prefix dims + one trailing var-width dim
        (decodeCompositeRowKey, PrimitiveType.scala:74-95)."""
        out, offset = [], 0
        for i, f in enumerate(fields):
            if f.length is not None:
                out.append(self.from_bytes(key, f.dt, offset, f.length))
                offset += f.length
            else:
                if i != len(fields) - 1:
                    raise ValueError(
                        f"variable-length dimension {f.col_name!r} must be last"
                    )
                out.append(self.from_bytes(key, f.dt, offset, len(key) - offset))
                offset = len(key)
        return out
