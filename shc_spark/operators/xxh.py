"""Pure-Python XXH64, bit-identical to Spark's ``F.xxhash64`` on
string columns (XXH64 over the UTF-8 bytes, seed 42 — the public
xxHash spec Spark implements in
``org.apache.spark.sql.catalyst.expressions.XxHash64``).

Why it exists: serving-index queries need the bucket of each QUERY
term/id under the same hash the WRITER used (``pmod(xxhash64(col),
num_buckets)``). Deriving those few buckets through a Spark job costs
a driver round-trip per query; computing them here costs microseconds
and zero jobs. Equality with Spark is pinned by a hypothesis property
test (tests/test_operators.py) — if Spark ever changed the hash, the
test (and every index gate) would catch it.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """Signed 64-bit XXH64 of ``data`` — equals
    ``F.xxhash64(string_col)`` for the column's UTF-8 bytes."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            def _rd(o):
                return int.from_bytes(data[o:o + 8], "little")

            v1 = (_rotl((v1 + _rd(i) * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + _rd(i + 8) * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + _rd(i + 16) * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + _rd(i + 24) * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK)) * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h = ((_rotl(h ^ ((_rotl((k * _P2) & _MASK, 31) * _P1) & _MASK), 27) * _P1) + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h = ((_rotl(h ^ ((k * _P1) & _MASK), 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _MASK), 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = 42) -> int:
    return xxhash64_bytes(s.encode("utf-8"), seed)


def bucket_of_str(s: str, num_buckets: int) -> int:
    """``pmod(xxhash64(s), num_buckets)`` — the writer-side bucket of
    a string key, computed without a Spark job."""
    return xxhash64_str(s) % num_buckets
