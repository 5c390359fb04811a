"""Round-5 feature showcase — joins, retention, and corpus monitoring:

1. BINNED RANGE JOIN: count events into ad-hoc time intervals with NO
   equi key at all — the operator rewrites the non-equi predicate as
   a bin equi-join (hash join, never a nested loop).
2. PER-FAMILY TTL: an shc table whose metrics family expires after 7
   days while its identity family does not; major compaction makes
   the expiry physical.
3. PSI DRIFT: Population Stability Index between the first and second
   half of the month — the "did the data shift?" gate before a drop
   is trusted.
4. HARD NEGATIVES: per query embedding, the most-similar vectors from
   a DIFFERENT label (the contrastive-training negative pool).

Run: python examples/intervals_ttl_drift.py
"""

import json


def main(spark, root=None):
    import tempfile

    from pyspark.sql import functions as F

    from shc_spark.operators import similarity
    from shc_spark.operators.dq import psi_drift
    from shc_spark.operators.ranges import range_join
    from shc_spark.queries.relational import _events
    from shc_spark.sources import apply_cdc, compact_table, read_table

    root = root or tempfile.mkdtemp(prefix="shc_r5_ex_")
    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf)

    # -- 1. binned range join -------------------------------------------
    iv = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 13 == 0)
    ).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("ts")
    per_interval = (
        range_join(clicks, iv, "ts", "s", "e")
        .groupBy("interval_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    print("intervals with clicks:", per_interval.count())

    # -- 2. per-family TTL ----------------------------------------------
    cat = json.dumps(
        {
            "table": {"namespace": "ex", "name": "evttl", "tableCoder": "OrderedType", "version": "2.0", "ttl": {"fa": 604800}},
            "rowkey": "key",
            "columns": {
                "event_id": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "value": {"cf": "fa", "col": "v", "type": "double"},
                "user_id": {"cf": "fb", "col": "u", "type": "bigint"},
            },
        }
    )
    feed = ev.select(
        "event_id", "value", "user_id", F.lit("I").alias("op"), F.col("ts").alias("evt")
    )
    apply_cdc(spark, cat, feed, root=root, ts_col="evt")
    now_ms = ev.select(F.unix_millis(F.max("ts"))).first()[0]
    live = read_table(spark, cat, root=root, ttl_now_ms=now_ms)
    n_expired = live.filter(F.col("value").isNull()).count()
    print("rows with expired metrics cells:", n_expired, "of", live.count())
    compact_table(spark, cat, root=root, apply_ttl=True, ttl_now_ms=now_ms, num_regions=2)

    # -- 3. PSI drift ----------------------------------------------------
    h = psi_drift(
        ev.filter(F.dayofmonth("ts") <= 15).select("value"),
        ev.filter(F.dayofmonth("ts") > 15).select("value"),
        "value",
        [10.0, 20.0, 50.0, 100.0],
    )
    psi = h.agg(F.sum("psi_contrib")).first()[0]
    print(f"PSI = {psi:.4f} ({'stable' if psi < 0.1 else 'shifted'})")

    # -- 4. hard negatives ----------------------------------------------
    import os

    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    negs = similarity.hard_negative_topk(
        emb.filter(F.col("vec_id") < 4), emb, "embedding", "vec_id", "label", k=3
    )
    print("hard negatives mined:", negs.count())


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from shc_spark.session import get_spark

    main(get_spark("example-r5", cpus=8))
