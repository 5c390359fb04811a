"""Time-series gap filling: the hypertable ``time_bucket_gapfill``
analog (TimescaleDB/InfluxDB family) on plain DataFrames.

``gapfill`` buckets event time, builds each key's dense bucket spine
(min..max bucket, per key), left-joins the actual per-bucket
aggregates onto it, and fills the holes:

- ``how="locf"``: last observation carried forward;
- ``how="linear"``: linear interpolation between the surrounding
  observed buckets (leading/trailing holes stay null — no
  extrapolation);
- ``how="null"``: just the dense spine (holes explicit).

Scale shape: the spine explode is ``sequence()`` per key (codegen,
bounded by the key's own time span — a key active for a day costs 24
rows at 1 h buckets, not the table's global span); the fill is one
window per key ordered by bucket (two for linear), parallel across
keys. Nothing is driver-side; no global window exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    how: str = "locf",
    round_dp: int | None = None,
) -> DataFrame:
    """(key, bucket_start TIMESTAMP, value DOUBLE, observed BOOLEAN),
    one row per key per bucket in the key's [min, max] bucket span.
    Multiple events in one bucket aggregate by AVG before filling;
    ``round_dp`` rounds that aggregate BEFORE interpolation — without
    it, engine-specific summation-order ulps in the aggregate get
    carried into every interpolated value, and a value landing within
    an ulp of a rounding boundary flips its last output digit (seen
    live against the DuckDB oracle: pin the inputs, and identical
    formulas stay bit-identical)."""
    if how not in ("locf", "linear", "null"):
        raise ValueError("how must be locf, linear, or null")
    if bucket_seconds < 1:
        raise ValueError("bucket_seconds must be >= 1")

    # FLOOR, not cast-truncation: truncation rounds toward zero, so a
    # pre-1970 (negative-epoch) timestamp would land one bucket LATE
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast(
        "long"
    ) * bucket_seconds
    agg = F.avg("v")
    if round_dp is not None:
        agg = F.round(agg, round_dp)
    actual = (
        df.select(F.col(key_col).alias("key"), b.alias("b"), F.col(value_col).alias("v"))
        .groupBy("key", "b")
        .agg(agg.alias("v"))
    )
    spine = (
        actual.groupBy("key")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.lit(int(bucket_seconds)))
            ).alias("b"),
        )
    )
    dense = spine.join(actual, ["key", "b"], "left").withColumn(
        "observed", F.col("v").isNotNull()
    )

    if how == "locf":
        w = (
            Window.partitionBy("key")
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dense = dense.withColumn("v", F.last("v", ignorenulls=True).over(w))
    elif how == "linear":
        wp = (
            Window.partitionBy("key")
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wn = (
            Window.partitionBy("key")
            .orderBy("b")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        prev_v = F.last("v", ignorenulls=True).over(wp)
        prev_b = F.last(F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True).over(wp)
        next_v = F.first("v", ignorenulls=True).over(wn)
        next_b = F.first(F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True).over(wn)
        interp = prev_v + (next_v - prev_v) * (
            (F.col("b") - prev_b) / (next_b - prev_b)
        )
        dense = dense.withColumn(
            "v",
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                F.when(prev_v.isNotNull() & next_v.isNotNull(), interp)
            ),
        )

    return dense.select(
        F.col("key").alias(key_col),
        F.timestamp_seconds(F.col("b")).alias("bucket_start"),
        F.col("v").alias(value_col),
        "observed",
    )


def counter_increase(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-sample INCREASE of a monotone counter with reset handling
    (the PromQL increase()/rate() building block): a sample's
    contribution is ``v - lag(v)`` when non-negative, else ``v`` (a
    drop means the counter restarted from zero, so the new reading IS
    the increase since the reset). First sample per key contributes
    null (no baseline). One per-key window, parallel across keys."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    delta = F.col(value_col) - prev
    return df.withColumn(
        "increase",
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .when(delta >= 0, delta)
        .otherwise(F.col(value_col)),
    )
