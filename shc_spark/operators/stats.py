"""Distribution statistics for corpus curation: numeric profiling,
group-wise quantiles, and winsorization (outlier clipping).

All discrete-quantile selection uses the element-at-floor((n-1)*p)
rule via a spill-safe ranked window (no collect_list, no
interpolation ulps) — the same engine-neutral convention as
q_percentiles_datetime. Bounds tables are tiny (one row per group)
and broadcast back; the corpus itself never shuffles for the clip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Numeric column profile in ONE aggregate scan, long format:
    (col_name, n, n_null, n_distinct, min, max, mean, stddev) — mean
    and stddev rounded to 4dp, min/max/mean/stddev as double."""
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.countDistinct(col).alias(f"{c}__nd"),
            F.min(col).alias(f"{c}__mn"),
            F.max(col).alias(f"{c}__mx"),
            F.round(F.avg(col), 4).alias(f"{c}__av"),
            F.round(F.stddev_samp(col), 4).alias(f"{c}__sd"),
        ]
    row = df.agg(*aggs)
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"{c}__n").alias("n"),
                    F.col(f"{c}__nn").alias("n_null"),
                    F.col(f"{c}__nd").alias("n_distinct"),
                    F.col(f"{c}__mn").alias("min"),
                    F.col(f"{c}__mx").alias("max"),
                    F.col(f"{c}__av").alias("mean"),
                    F.col(f"{c}__sd").alias("stddev"),
                )
                for c in cols
            ]
        )
    ).alias("r")
    return row.select(report).select("r.*")


def group_quantiles(
    df: DataFrame, value_col: str, group_cols: list[str], ps: list[float]
) -> DataFrame:
    """Per-group discrete quantiles: one output row per group with a
    q_<idx> column per requested p (value at position
    floor((n-1)*p), 0-based, of the sorted group)."""
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = df.select(*group_cols, value_col).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols)))

    def pick(p):
        idx = F.floor((F.col("__n") - 1) * F.lit(p)).cast("int") + 1
        return F.max(F.when(F.col("__rn") == idx, F.col(value_col)))

    return ranked.groupBy(*group_cols).agg(
        *[pick(p).alias(f"q_{i}") for i, p in enumerate(ps)]
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lo_p, hi_p] discrete
    quantiles — the standard outlier treatment before score-based
    filtering. Adds ``<value_col>_w``; the bounds table (one row per
    group) broadcasts, the data itself only shuffles inside the
    bounds computation's window."""
    b = group_quantiles(df, value_col, group_cols, [lo_p, hi_p]).withColumnsRenamed(
        {"q_0": "__lo", "q_1": "__hi"}
    )
    return (
        df.join(F.broadcast(b), group_cols)
        .withColumn(
            f"{value_col}_w",
            F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        )
        .drop("__lo", "__hi")
    )


def histogram(
    df: DataFrame, value_col: str, bins: int, lo: float | None = None, hi: float | None = None
) -> DataFrame:
    """Equi-width histogram: (bin, lo, hi, cnt) for ``bins`` buckets
    over [lo, hi] (bounds default to the column's min/max, computed in
    the same job as a 1-row broadcast scalar — no driver round-trip).
    Values at the upper bound land in the LAST bin (floor would open a
    phantom bins+1-th bucket for x == hi). One scan + a tiny
    ``bins``-row aggregate; empty bins are omitted (join a range to
    densify if needed)."""
    v = F.col(value_col).cast("double")
    src = df.select(v.alias("__v")).where(F.col("__v").isNotNull())
    if lo is None or hi is None:
        b = src.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
        src = src.crossJoin(F.broadcast(b))
    else:
        src = src.withColumn("__lo", F.lit(float(lo))).withColumn("__hi", F.lit(float(hi)))
    width = (F.col("__hi") - F.col("__lo")) / bins
    # constant column -> width 0 -> (v-lo)/width is NaN, and floor(NaN)
    # would invent a phantom bucket: collapse to bin 0 explicitly
    raw = F.when(width == 0, F.lit(0)).otherwise(
        F.floor((F.col("__v") - F.col("__lo")) / width)
    )
    bin_ = F.least(raw, F.lit(bins - 1)).cast("long")
    return (
        src.where((F.col("__v") >= F.col("__lo")) & (F.col("__v") <= F.col("__hi")))
        .groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.first(F.col("__lo")) + F.first(width) * F.col("bin"), 6).alias("lo"),
            F.round(F.first(F.col("__lo")) + F.first(width) * (F.col("bin") + 1), 6).alias("hi"),
        )
        .select("bin", "lo", "hi", "cnt")
    )


def anomaly_robust_z(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
    approximate: bool | str = "auto",
    accuracy: int = 1000,
    auto_threshold: int = 100_000,
) -> DataFrame:
    """Robust per-group outlier flags: median/MAD instead of mean/std
    (one wild value cannot drag its own threshold). Adds ``med``,
    ``mad`` and ``is_anomaly`` = |x - med| > k * MAD (groups with
    MAD = 0 flag nothing — a degenerate spread means no robust scale).

    Exact path: both medians use the discrete
    element-at-floor((n-1)*0.5) rule (engine-neutral, no interpolation
    ulps); the two tiny per-group stats tables broadcast back, so the
    fact table shuffles only inside the ranked windows that select the
    medians. That double per-group sort is the scale ceiling (measured
    21x wall at x100, SCALE.md) — at 100 TB pass ``approximate=True``:
    ``approx_percentile`` (Greenwald-Khanna, mergeable partial
    sketches) replaces each ranked window with one map-side-combined
    aggregate, no per-group sort at all; median/MAD are then within
    1/accuracy relative rank error, which perturbs ``is_anomaly`` only
    for points sitting exactly at the k*MAD boundary. Sketch insertion
    cost scales with ``accuracy`` (measured at 10M rows: accuracy
    10000 -> 12.3 s, 1000 -> 4.0 s vs 18.6 s exact), so the default is
    1000 — 0.1% rank error, ample for a 3-sigma-style flag; raise it
    if the flag boundary needs tighter placement.

    ``approximate="auto"`` (the default, VERDICT r8 #5) picks the path
    by SHAPE, the same discipline as dedup.connected_components_auto:
    one tiny aggregate measures average rows per group, and above
    ``auto_threshold`` (100k — where the exact path's per-group sorts
    start dominating, SCALE.md) the sketch path runs instead. A
    default caller therefore gets exact medians at test/gate scale and
    the 100 TB-safe plan at 100 TB, without knowing the knob exists.
    Pass ``approximate=False`` to force exactness regardless of
    size (and accept the per-group sort wall)."""
    # null values would sort FIRST in the ranked window and could be
    # picked as the median — exclude them (they also can't be flagged)
    df = df.where(F.col(value_col).isNotNull())
    if approximate == "auto":
        shape = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(F.concat_ws("\x00", *group_cols)).alias("g"),
        ).collect()[0]
        approximate = shape["n"] / max(shape["g"], 1) > auto_threshold
    if approximate:
        med = df.groupBy(*group_cols).agg(
            F.percentile_approx(value_col, 0.5, accuracy).alias("med")
        )
    else:
        med = group_quantiles(df, value_col, group_cols, [0.5]).withColumnRenamed(
            "q_0", "med"
        )
    with_med = df.join(F.broadcast(med), group_cols).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("med"))
    )
    if approximate:
        mad = with_med.groupBy(*group_cols).agg(
            F.percentile_approx("__adev", 0.5, accuracy).alias("mad")
        )
    else:
        mad = group_quantiles(with_med, "__adev", group_cols, [0.5]).withColumnRenamed(
            "q_0", "mad"
        )
    return (
        with_med.join(F.broadcast(mad), group_cols)
        .withColumn(
            "is_anomaly",
            (F.col("mad") > 0) & (F.col("__adev") > k * F.col("mad")),
        )
        .drop("__adev")
    )


def equi_depth_buckets(
    df: DataFrame,
    value_col: str,
    id_col: str,
    buckets: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, value, bucket) identical to ``ntile(buckets) OVER (ORDER BY
    value, id)`` — but WITHOUT the single-partition global window: the
    classic equi-depth assignment (length-bucketed batching, score
    deciles) via the two-phase distributed rank (same machinery as
    pack.py): range-partition + sort, per-partition counts -> exclusive
    offsets broadcast, local row index + offset = global rank, bucket =
    (rank-1)*B // N + 1 (exactly ntile's remainder-first distribution).

    Eager-evaluation contract: the call MATERIALIZES its full result
    (counts job + an eager localCheckpoint that pins the assignment so
    re-execution can never re-sample range boundaries) — the cost is
    paid at call time even if the result is never used, and the
    checkpointed blocks are NOT recomputable on executor loss (lineage
    is cut; on a lost executor, re-run the call)."""
    from typing import Iterator

    import pandas as pd

    spark = df.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sorted_df = (
        df.select(F.col(id_col).alias("id"), F.col(value_col).alias("v"))
        .repartitionByRange(P, "v", "id")
        .sortWithinPartitions("v", "id")
        .cache()
    )

    def counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t = 0
        for pdf in batches:
            t += len(pdf)
        yield pd.DataFrame({"pid": [pid], "total": [t]})

    sums = sorted_df.mapInPandas(counts, "pid int, total long").collect()
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(sums, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["total"]
    n_total = acc

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        rank = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            import numpy as np

            r = rank + np.arange(1, len(pdf) + 1, dtype=np.int64)
            rank += len(pdf)
            out = pdf.rename(columns={})
            # ntile's exact rule: the first N%B buckets take the
            # ceil-sized share (floor((r-1)*B/N) would SPREAD the
            # remainder evenly instead — measurably different)
            q, m = n_total // buckets, n_total % buckets
            big = (q + 1) * m  # ranks covered by the larger buckets
            out["bucket"] = np.where(
                r <= big,
                (r - 1) // (q + 1) + 1,
                m + (r - 1 - big) // max(q, 1) + 1,
            )
            yield out

    out = sorted_df.mapInPandas(emit, schema=f"id {df.schema[id_col].dataType.simpleString()}, v {df.schema[value_col].dataType.simpleString()}, bucket long")
    out = out.withColumnRenamed("id", id_col).withColumnRenamed("v", value_col)
    # The cached sort MUST back every materialization of `out`
    # (repartitionByRange samples range boundaries per run, so an
    # uncached recompute could place rows differently than the counts
    # job saw and corrupt the global ranks) — but leaving it cached for
    # the session lifetime leaks executor memory across calls. An
    # EAGER localCheckpoint pins the finished assignment (MEMORY_AND_
    # DISK, spill-safe, same size as the output) and cuts the lineage
    # back to the cache, which is then safe to release.
    out = out.localCheckpoint(eager=True)
    sorted_df.unpersist()
    return out
