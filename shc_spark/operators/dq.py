"""Declarative data-quality validation (Deequ-style constraint suite).

Before a 100 TB corpus feeds a training run, you assert invariants on
it — keys unique, mandatory fields present, values in range, codes
well-formed — and you want ALL of them measured in ONE pass over the
data, not one scan per constraint.

``validate(df, checks)`` compiles every check into an aggregate
expression, evaluates them in a single ``agg`` (one scan, map-side
combined; the only caveat is that each exact ``uniqueness`` check adds
an expand branch to the aggregate — at extreme scale swap those to
``approx_count_distinct`` if a tolerance is acceptable), then explodes
the 1-row result into the long-format report:

    (check_name, col_name, metric, threshold, passed)

Metrics are fractions in [0, 1], rounded to 6dp so the report is
engine-neutral and oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    kind: str
    column: str
    threshold: float
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None

    def metric(self) -> Column:
        c = F.col(self.column)
        if self.kind == "completeness":
            # try_divide: an empty table yields a null metric (-> check
            # fails) instead of an ANSI divide-by-zero error
            m = F.try_divide(F.count(c), F.count(F.lit(1)))
        elif self.kind == "uniqueness":
            m = F.try_divide(F.countDistinct(c), F.count(c))
        elif self.kind == "bounds":
            m = F.avg(
                F.when(c.isNull(), F.lit(None)).otherwise(
                    F.when(c.between(self.lo, self.hi), 1.0).otherwise(0.0)
                )
            )
        elif self.kind == "matches":
            m = F.avg(
                F.when(c.isNull(), F.lit(None)).otherwise(
                    F.when(c.rlike(self.pattern), 1.0).otherwise(0.0)
                )
            )
        else:
            raise ValueError(f"unknown check kind {self.kind!r}")
        return F.round(m, 6)


def completeness(column: str, min_ratio: float = 1.0) -> Check:
    """Fraction of rows with a non-null value."""
    return Check("completeness", column, min_ratio)


def uniqueness(column: str, min_ratio: float = 1.0) -> Check:
    """Distinct values / non-null values (1.0 = a key column)."""
    return Check("uniqueness", column, min_ratio)


def bounds(column: str, lo: float, hi: float, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values inside [lo, hi]."""
    return Check("bounds", column, min_ratio, lo=lo, hi=hi)


def matches(column: str, pattern: str, min_ratio: float = 1.0) -> Check:
    """Fraction of non-null values matching the regex."""
    return Check("matches", column, min_ratio, pattern=pattern)


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregate scan; one report row per
    check: (check_name, col_name, metric, threshold, passed)."""
    if not checks:
        raise ValueError("no checks given")
    row = df.agg(*[ch.metric().alias(f"m{i}") for i, ch in enumerate(checks)])
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ch.kind).alias("check_name"),
                    F.lit(ch.column).alias("col_name"),
                    F.col(f"m{i}").alias("metric"),
                    F.lit(float(ch.threshold)).alias("threshold"),
                    # a null metric (empty table, all-null column) is a
                    # FAILED check, not an unknown one
                    F.coalesce(F.col(f"m{i}") >= ch.threshold, F.lit(False)).alias(
                        "passed"
                    ),
                )
                for i, ch in enumerate(checks)
            ]
        )
    ).alias("r")
    return row.select(report).select("r.*")


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    edges: list[float],
    laplace: float = 0.5,
) -> DataFrame:
    """Population Stability Index between a reference corpus and a
    current corpus over FIXED bucket edges — the standard drift check
    before trusting a new data drop: PSI < 0.1 stable, 0.1-0.25
    moderate shift, > 0.25 investigate.

    One aggregate scan per side (map-side combined, at most ``B``
    result rows each, B = len(edges)+1 buckets), then all arithmetic on the tiny joined histogram —
    nothing about the corpora ever shuffles. Bucket ``i`` holds values
    in [edge_i-1, edge_i) with open under/overflow ends; nulls are
    excluded. Fractions are Laplace-smoothed ((n_i + a) / (N + a*B))
    so empty buckets cannot blow up the log; per-bucket rows carry the
    smoothed fractions and the PSI contribution (sum them for the
    index), all rounded to 6dp for engine-neutral comparison."""
    if not edges or any(b <= a for a, b in zip(edges, edges[1:])):
        # STRICTLY ascending: a duplicate edge creates an impossible
        # [e, e) bucket that still receives Laplace mass and skews
        # every smoothed fraction
        raise ValueError("edges must be a non-empty strictly ascending list")
    B = len(edges) + 1

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        v = F.col(column)
        b = sum(
            ((v >= F.lit(float(e))).cast("int") for e in edges), F.lit(0)
        ).alias("bucket")
        return (
            df.filter(v.isNotNull())
            .select(b)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    r = bucketed(ref, "ref_n")
    c = bucketed(cur, "cur_n")
    spark = ref.sparkSession
    all_b = spark.range(B).select(F.col("id").cast("int").alias("bucket"))
    h = (
        all_b.join(r, "bucket", "left")
        .join(c, "bucket", "left")
        .fillna(0, ["ref_n", "cur_n"])
    )
    a = float(laplace)
    # pin the B-row histogram once (each corpus scanned exactly one
    # time, into the checkpoint), then totals are a broadcast join of
    # its own aggregate — no global window (whose WindowExec warning
    # is noise), no second corpus scan
    h = h.localCheckpoint(eager=True)
    h = h.crossJoin(
        F.broadcast(h.agg(F.sum("ref_n").alias("__rt"), F.sum("cur_n").alias("__ct")))
    )
    p = (F.col("ref_n") + a) / (F.col("__rt") + a * B)
    q = (F.col("cur_n") + a) / (F.col("__ct") + a * B)
    return h.select(
        "bucket",
        "ref_n",
        "cur_n",
        F.round(p, 6).alias("ref_frac"),
        F.round(q, 6).alias("cur_frac"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )
