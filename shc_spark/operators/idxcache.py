"""Memoized, staleness-safe parquet relations for persisted serving
indexes (the IVF index in similarity.py, the dedup index in dedup.py).

Loading a partitioned parquet tree runs a listing job with one task
per partition directory — at 1024 bucket dirs that is more tasks than
the pruned read itself (measured: a 3-bucket query ran 1024 listing
tasks + ~3 read tasks). A serving system lists once and queries many
times; reuse is safe here because these are plain parquet reads (the
Spark 4.1 replan hazard is specific to Python DataSource relations)
and per-query partition pruning happens at planning time against the
cached file index. The _SUCCESS mtime guards staleness: every append
rewrites it, invalidating the entry even when another process did the
append.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# (appId, absolute subtree path) -> (_SUCCESS mtime_ns, DataFrame)
_RELATIONS: dict = {}


def index_relation(spark, path: str, sub: str) -> DataFrame:
    p = os.path.join(path, sub)
    try:
        mtime = os.stat(os.path.join(p, "_SUCCESS")).st_mtime_ns
    except OSError:
        mtime = -1  # no marker: fall through, never cache-hit
    key = (spark.sparkContext.applicationId, p)
    hit = _RELATIONS.get(key)
    if hit is not None and hit[0] == mtime and mtime != -1:
        return hit[1]
    df = spark.read.parquet(p)
    _RELATIONS[key] = (mtime, df)
    return df
