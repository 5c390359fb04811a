"""Behavioral / product analytics over event logs: funnel conversion
and cohort retention — the two queries every event pipeline runs, as
reusable operators.

Scale shape: each funnel step is one filtered aggregate joined on the
user key (k steps = k shuffles on the same key — pre-partition by
user and they all reuse the exchange); retention is two grouped
aggregates. No windows over unbounded partitions, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel conversion: a user reaches step i when an event
    of type steps[i] occurs STRICTLY AFTER their step-i-1 time (first
    qualifying occurrence counts). Output one row per step:
    (step, step_name, n_users), n_users non-increasing."""
    if not steps:
        raise ValueError("no steps")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            df.filter(F.col(type_col) == s)
            .join(cur.select(user_col, f"t{i - 1}"), user_col)
            .filter(F.col(ts_col) > F.col(f"t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        cur = cur.join(nxt.select(user_col, f"t{i}"), user_col, "left")
    counts = cur.agg(
        *[F.count(F.col(f"t{i}")).alias(f"n{i}") for i in range(len(steps))]
    )
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("long").alias("step"),
                    F.lit(s).alias("step_name"),
                    F.col(f"n{i}").alias("n_users"),
                )
                for i, s in enumerate(steps)
            ]
        )
    ).alias("r")
    return counts.select(report).select("r.*")


def cohort_retention(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday of the user's first
    event week; a (cohort, offset) cell counts users active in week
    cohort+offset. Output: (cohort string, week_offset, n_users)."""
    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("__cohort")
    )
    active = df.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("__week")
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort"),
            (F.datediff(F.col("__week"), F.col("__cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def rolling_active_users(
    df: DataFrame, user_col: str, ts_col: str, window_days: int = 7
) -> DataFrame:
    """Rolling N-day active users per calendar day (WAU for N=7): for
    every day with any activity, the distinct users active in
    [day - N + 1, day]. The naive per-day distinct-over-range is a
    range self-join; this materializes per-(user, day) activity once
    and EXPLODES each activity day onto the <= N window days it
    supports — turning the range join into an equi-groupBy whose
    fan-out is bounded by N. Output: (day string, n_active)."""
    per_day = df.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("d")
    ).distinct()
    days = df.select(F.to_date(ts_col).alias("day")).distinct()
    supported = per_day.select(
        "u",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("day"),
    )
    return (
        supported.join(days, "day", "left_semi")  # only days that exist
        .groupBy("day")
        .agg(F.countDistinct("u").alias("n_active"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "n_active")
    )
