"""Batch sessionization: gap-based session assignment over an event
log (the batch complement of streaming/events.py's session windows —
same semantics, replayable over historical data).

One shuffle on the session key: the lag/flag/cumulative-sum chain
runs in a single window stage partitioned by key; the per-session
rollup groups on (key, session_id), which is a strict refinement of
the window partitioning (Spark still inserts the exchange — at 100 TB
pre-`repartition(key)` + AQE coalescing keeps it cheap, and the
per-key row counts are bounded by user activity, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a per-key ``session_id`` (1-based, in time order) to
    every event: a new session starts when the gap since the previous
    event of the same key exceeds ``gap_seconds``. ``tiebreak_col``
    makes the ordering total when timestamps collide."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    cum = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new_s", new_s).withColumn(
        "session_id", F.sum("__new_s").over(cum).cast("long")
    ).drop("__new_s")


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: (key, session_id, n_events, dur_us)."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak_col)
    return s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
        .cast("long")
        .alias("dur_us"),
    )
