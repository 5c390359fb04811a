"""Sequence packing: lay documents end-to-end into fixed-length
training sequences (concat-then-chop), assigning every document its
global token offset and the bin range it lands in.

The naive formulation is a global running sum — `sum() OVER (ORDER BY
id)` — which Spark executes as a SINGLE-PARTITION window: the whole
corpus funnels through one task. This module implements the classic
two-phase distributed prefix-sum instead:

1. range-partition + sort by id (one shuffle; the ordering that
   defines the packing),
2. one tiny pass collects per-partition token totals (== partition
   count rows to the driver),
3. the exclusive partition offsets broadcast back into a second
   Arrow-batched pass that adds the within-partition running sum.

Every stage is bounded: the driver sees one row per partition, each
executor holds one Arrow batch. Output is identical to the
single-partition window (value-exact oracle-checkable) at any scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    count_col: str,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n, tok_start, bin_start, bin_end): document `id` occupies
    global token positions [tok_start, tok_start + n) in id order, and
    therefore training bins floor(tok_start/seq_len) ..
    floor((tok_start + max(n,1) - 1)/seq_len) under concat-then-chop
    packing at ``seq_len`` tokens per sequence."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = df.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # cache pins ONE materialized range-partitioning so both passes see
    # identical partition boundaries (repartitionByRange samples)
    sorted_df = (
        df.select(F.col(id_col).alias("id"), F.col(count_col).cast("long").alias("n"))
        .repartitionByRange(P, "id")
        .sortWithinPartitions("id")
        .cache()
    )

    def totals(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t = 0
        for pdf in batches:
            t += int(pdf["n"].sum())
        yield pd.DataFrame({"pid": [pid], "total": [t]})

    sums = sorted_df.mapInPandas(totals, "pid int, total long").collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(sums, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["total"]

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        run = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            n = pdf["n"].to_numpy(dtype=np.int64)
            starts = run + np.concatenate(([0], np.cumsum(n[:-1]))) if len(n) else n
            run += int(n.sum())
            yield pd.DataFrame({"id": pdf["id"], "n": n, "tok_start": starts})

    out = sorted_df.mapInPandas(emit, f"id {df.schema[id_col].dataType.simpleString()}, n long, tok_start long")
    last = F.col("tok_start") + F.greatest(F.col("n"), F.lit(1)) - 1
    return out.select(
        F.col("id").alias(id_col),
        "n",
        "tok_start",
        F.floor(F.col("tok_start") / seq_len).alias("bin_start"),
        F.floor(last / seq_len).alias("bin_end"),
    )
