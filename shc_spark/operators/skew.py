"""Skew mitigation: salted joins for heavy-hitter keys.

AQE's skew-join handles skew in sort-merge joins automatically
(spark.sql.adaptive.skewJoin.enabled, on in our session); this module
is the explicit tool for cases AQE can't fix — e.g. a shuffled-hash
join where one key holds >> partition-size rows, or aggregations with
a hot group.

``salted_join``: the skewed (large) side gets a random salt in
[0, salt); the small side is exploded ``salt`` times (one copy per
salt value). The join key becomes (key, salt) — the hot key's rows
spread over ``salt`` partitions. Row multiplicity is preserved
exactly; cost is small-side * salt, so pick salt ~ (hot-key rows /
target-partition-rows).

``salted_agg_count``: two-phase aggregation for hot groups — partial
aggregate on (key, salt), then final aggregate on key. (Spark's
HashAggregate already does map-side partials; this pattern matters
for exact-distinct or collect-style aggs where partials don't
compose.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``large`` (skewed) with ``small`` on column ``on``,
    spreading each key over ``salt`` shuffle partitions.

    Deterministic salting: hash of the large side's full row spread via
    pmod, not rand() — reruns and retried tasks produce identical
    partitioning (rand() in a shuffle input is a correctness hazard
    under task retry).

    Only join types where the exploded small side cannot leak
    unmatched duplicates are allowed: inner / left / left_semi /
    left_anti (a right/full outer would emit each unmatched small-side
    row ``salt`` times)."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the exploded small "
            "side would duplicate unmatched rows in right/full outer joins"
        )
    lcols = [c for c in large.columns]
    salted_large = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt)).cast("int")
    )
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_large.join(salted_small, [on, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_agg_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """count(*) per key with an explicit two-phase salted aggregation:
    groupBy(key, salt) -> partial counts -> groupBy(key) -> sum."""
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    partial = salted.groupBy(key, SALT_COL).agg(F.count(F.lit(1)).alias("__n"))
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))
