"""Bloom-filter semi-join: the runtime-filter pattern, explicit.

``text_decontaminate`` broadcasts the EXACT key set — right whenever
the keys fit. When the filter side is large (hundreds of millions of
ids), the exact set doesn't broadcast but an m-bit Bloom filter does:
probe rows pass through a map-only membership test that discards the
overwhelming majority, and only the small candidate remainder pays
the exact semi-join. False positives cannot leak — the exact join is
the last word — so the OUTPUT is identical to a plain semi-join (the
oracle), while the big side never shuffles in full.

Scale shape:
- bit positions are computed JVM-side (``xxhash64(key, seed_i) %
  num_bits`` — codegen, no Python hashing);
- the bitmap is assembled distributed: per-partition numpy bitmaps,
  OR-merged per fixed-size CHUNK via applyInPandas (the driver
  receives exactly num_bits/8 bytes once, never a per-partition pile);
- the probe is one broadcast numpy array + vectorized fancy-indexed
  bit tests inside an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHUNK_BYTES = 32 * 1024


def _positions(col, num_bits: int, num_hashes: int):
    """Array column of the key's bit positions (non-negative)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def build_bloom(
    df: DataFrame, key_col: str, num_bits: int = 1 << 23, num_hashes: int = 4
) -> bytes:
    """Distributed Bloom build -> num_bits/8 bytes on the driver.
    Position computation is codegen'd; bitmap assembly never
    materializes more than one chunk per (chunk, partition) pair."""
    if num_bits % (8 * _CHUNK_BYTES):
        raise ValueError("num_bits must be a multiple of 8 * chunk bytes")
    pos = (
        df.select(F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("p"))
        .distinct()
        .withColumn("chunk", (F.col("p") / (8 * _CHUNK_BYTES)).cast("int"))
    )

    def to_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        chunk = int(pdf["chunk"].iloc[0])
        bits = np.zeros(_CHUNK_BYTES, dtype=np.uint8)
        local = pdf["p"].to_numpy() - chunk * 8 * _CHUNK_BYTES
        np.bitwise_or.at(bits, local // 8, (1 << (local % 8)).astype(np.uint8))
        return pd.DataFrame({"chunk": [chunk], "bits": [bits.tobytes()]})

    chunks = pos.groupBy("chunk").applyInPandas(to_chunk, "chunk int, bits binary")
    bitmap = bytearray(num_bits // 8)
    for row in chunks.collect():  # num_bits/8 bytes total, by construction
        off = row["chunk"] * _CHUNK_BYTES
        bitmap[off : off + _CHUNK_BYTES] = row["bits"]
    return bytes(bitmap)


def bloom_semi_join(
    probe: DataFrame,
    keys: DataFrame,
    probe_col: str,
    key_col: str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_col`` appears in ``keys`` —
    output identical to ``probe.join(keys, ..., "left_semi")``, built
    as bloom-prefilter (map-only) + exact semi-join on the survivors."""
    key_col = key_col or probe_col
    bitmap = np.frombuffer(
        build_bloom(keys, key_col, num_bits, num_hashes), dtype=np.uint8
    )

    @F.pandas_udf("boolean")
    def maybe(pos: pd.Series) -> pd.Series:
        if not len(pos):
            return pd.Series([], dtype=bool)
        out = np.ones(len(pos), dtype=bool)
        arr = np.stack(pos.to_numpy())  # (rows, num_hashes)
        for j in range(arr.shape[1]):
            p = arr[:, j]
            out &= (bitmap[p // 8] & (1 << (p % 8)).astype(np.uint8)) != 0
        return pd.Series(out)

    cand = probe.withColumn(
        "__pos", _positions(F.col(probe_col), num_bits, num_hashes)
    ).filter(maybe(F.col("__pos"))).drop("__pos")
    dedup_keys = keys.select(F.col(key_col).alias(probe_col)).distinct()
    return cand.join(dedup_keys, probe_col, "left_semi")
