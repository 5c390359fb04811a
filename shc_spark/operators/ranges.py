"""Binned range (interval) join: points ⋈ intervals on
``start <= point <= end`` without a nested-loop join.

Spark has no native range join: a plain non-equi condition plans as
BroadcastNestedLoopJoin (O(N·M) comparisons, and only if one side
fits in a broadcast) or a cartesian product. The classic scale-out
rewrite is BINNING: pick a width W, give every point the single bin
``floor(p/W)``, explode every interval to the bins it touches
(``floor(s/W) .. floor(e/W)``), and equi-join on the bin — Catalyst
plans a normal shuffled/broadcast hash join — then re-check the exact
range predicate. Each qualifying (point, interval) pair meets in
EXACTLY one bin (the point's), so no dedup pass is needed.

Scale shape:
- the only shuffle is the bin (+ optional key) equi-join; both sides
  stay columnar and codegen'd end-to-end — no Python in the path;
- W is derived from the 75th-percentile interval span when not given,
  so a typical interval explodes to ~1-2 bins (the fan-out IS the
  cost knob, and it is measured, not guessed);
- outlier-long intervals would explode to thousands of bins each;
  intervals spanning more than ``long_interval_bins`` bins are split
  off and joined via a bounded BROADCAST non-equi join instead (they
  are few by construction — a count guard refuses the pathological
  case rather than silently planning a giant explode).

The same operator serves STREAMING enrichment unchanged: a streaming
point side against static intervals composes entirely of stateless
ops (bin column, stream-static equi-join on the bin, exact re-filter),
so tagging a stream with the interval it falls into needs NO state
store at all (gate: stream_range_tag, pinned equal to the batch join).

Reference parity note: the reference connector has no range join;
this is a pipeline-layer operator (SURVEY §2.3 "delegated relational
surface" extension), same family as the as-of join in
queries/relational.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_num(df: DataFrame, col: str) -> tuple[Column, bool]:
    """Numeric image of a column (timestamps -> epoch micros,
    dates -> epoch days). Returns (column, is_integral)."""
    dt = df.schema[col].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col)), True
    if isinstance(dt, T.DateType):
        return F.unix_date(F.col(col)).cast("long"), True
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.col(col).cast("long"), True
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return F.col(col).cast("double"), False
    raise TypeError(f"range_join: unsupported type {dt} for column {col}")


def _int_floordiv(col: Column, w: int) -> Column:
    """Exact floor(col / w) for integral columns. Spark's integer
    `div` truncates toward ZERO (wrong bin for negatives) and `/`
    routes through double (loses exactness above 2^53, i.e. for
    epoch-micros-scale values near the boundary): subtracting
    ``pmod(col, w)`` (always in [0, w)) makes the value an exact
    multiple, whose division IS the true floor."""
    wl = F.lit(int(w)).cast("long")
    c = col.cast("long")
    # (c - pmod(c, w)) is an exact multiple of w; its double quotient
    # is the exactly-representable integer floor(c/w) whenever the
    # numerator is below 2^53 — epoch micros (~1.8e15) sit 5000x
    # under that. A caller binning raw > 2^53 longs should pre-scale.
    return ((c - F.pmod(c, wl)) / wl).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_width: int | float | None = None,
    long_interval_bins: int = 64,
    max_long_intervals: int = 100_000,
) -> DataFrame:
    """Inner range join: every (point row, interval row) pair with
    ``start <= point <= end`` (closed on both ends) and equal values
    on the optional ``on`` key columns (present on both sides).
    Output columns: all point columns, then the interval's non-key
    columns (names must not clash — rename before joining).

    ``bin_width`` is in the column's numeric unit (micros for
    timestamps, days for dates); when None it is derived from the
    75th-percentile interval span.

    Eager-evaluation contract: construction runs ONE small aggregate
    job over the intervals side (p75 span when ``bin_width`` is None,
    plus the max span) — the returned DataFrame is not a purely lazy
    plan. The max span short-circuits the long-interval machinery:
    only when outlier-long intervals are PROVEN possible does a second
    job run (the ``max_long_intervals`` count guard, which refuses the
    pathological case before planning a giant broadcast). The point
    side is never scanned at construction time (it may be streaming).

    ``__p``/``__s``/``__e``/``__bin`` are reserved working names;
    inputs carrying them are refused (they would be silently
    overwritten and dropped)."""
    on = list(on or [])
    reserved = {"__p", "__s", "__e", "__bin"}
    for side, df in (("points", points), ("intervals", intervals)):
        hit = reserved & set(df.columns)
        if hit:
            raise ValueError(
                f"range_join: {side} contains reserved column names "
                f"{sorted(hit)}; rename them before joining"
            )
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"range_join: overlapping non-key columns {sorted(clash)}")

    p_num, p_int = _as_num(points, point_col)
    s_num, s_int = _as_num(intervals, start_col)
    e_num, e_int = _as_num(intervals, end_col)
    integral = p_int and s_int and e_int

    pts = points.withColumn("__p", p_num)
    ivs = (
        intervals.withColumn("__s", s_num)
        .withColumn("__e", e_num)
        .filter(F.col("__s") <= F.col("__e"))
    )

    # ONE pre-job over the (column-pruned) intervals side derives the
    # bin width AND the max span; the max span lets the common case
    # skip the long-interval count entirely (VERDICT r5 #2 / ADVICE).
    stats_cols = [F.max(F.col("__e") - F.col("__s")).alias("mx")]
    if bin_width is None:
        stats_cols.append(F.expr("approx_percentile(__e - __s, 0.75)").alias("w"))
    # collect(), not first(): take(1)'s incremental launch splits the
    # single aggregate into two scheduler jobs
    stats = ivs.select(*stats_cols).collect()[0]
    max_span = stats["mx"]
    if bin_width is None:
        w = stats["w"]
        bin_width = w if w else 1
        bin_width = max(int(bin_width), 1) if integral else max(float(bin_width), 1e-9)
    if bin_width <= 0:
        raise ValueError("range_join: bin_width must be > 0")
    if integral and int(bin_width) != bin_width:
        # int(0.5) would floor to a ZERO width (pmod by 0 -> NULL bins
        # -> silently empty result) and int(2.5) would silently bin at
        # a different width than requested — refuse instead
        raise ValueError(
            f"range_join: bin_width {bin_width} must be a whole number "
            "for integral point/start/end columns"
        )

    def bins(c: Column) -> Column:
        if integral:
            return _int_floordiv(c, int(bin_width))
        return F.floor(c / F.lit(float(bin_width))).cast("long")

    exact = (F.col("__p") >= F.col("__s")) & (F.col("__p") <= F.col("__e"))
    span_bins = bins(F.col("__e")) - bins(F.col("__s")) + 1
    # Short-circuit: span_bins <= floor(span/W) + 2, so when even the
    # MAX span sits at or under (L-2)*W no interval can exceed L bins
    # — the split filters, the guard job, and the whole long branch
    # are skipped, keeping construction at exactly one pre-job.
    possible_long = max_span is not None and max_span > (
        (long_interval_bins - 2) * bin_width
    )
    if possible_long:
        short_iv = ivs.filter(span_bins <= long_interval_bins)
        long_iv = ivs.filter(span_bins > long_interval_bins)
    else:
        short_iv, long_iv = ivs, None

    # Short intervals: explode to touched bins, equi-join on the bin.
    exploded = short_iv.withColumn(
        "__bin", F.explode(F.sequence(bins(F.col("__s")), bins(F.col("__e"))))
    )
    binned_pts = pts.withColumn("__bin", bins(F.col("__p")))
    matched = binned_pts.join(exploded, on=["__bin", *on]).filter(exact).drop("__bin")

    # Outlier-long intervals: few by construction — broadcast them
    # through the exact non-equi join (a bounded nested loop over a
    # tiny side is the RIGHT plan there; exploding them is not). The
    # count guard refuses the pathological case where "few" is false.
    n_long = long_iv.limit(max_long_intervals + 1).count() if possible_long else 0
    if n_long > max_long_intervals:
        raise ValueError(
            f"range_join: more than {max_long_intervals} intervals span > "
            f"{long_interval_bins} bins at bin_width={bin_width}; raise "
            "bin_width (fewer, fatter bins) or long_interval_bins"
        )
    if n_long:
        liv = F.broadcast(long_iv)
        cond = exact
        for k in on:
            cond = cond & (pts[k] == long_iv[k])
        long_matched = pts.join(liv, cond).drop(*(long_iv[k] for k in on))
        matched = matched.unionByName(long_matched)

    return matched.drop("__p", "__s", "__e")
