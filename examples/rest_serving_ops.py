"""Serving-side operations over the REST transport: the HBase client
surface a low-latency consumer uses against a live table —

1. BULK MULTIGET — a list of row keys answered in ONE /multiget round
   trip (missing keys simply absent, HBase Get semantics).
2. ATOMIC INCREMENT — a batch of counters read-add-written under the
   region-server lock, committed as ONE generation.
3. CHECK-AND-PUT — compare-and-swap on a cell's current bytes
   (None = the cell must be absent).
4. VERSION SCAN — scanner maxVersions: every key's history, up to N
   newest cells per column, reassembled one row per (key, ts).

Run: python examples/rest_serving_ops.py
"""


def main(spark, root=None):
    import json
    import os
    import tempfile

    from pyspark.sql import functions as F

    from shc_spark.sources import write_table
    from shc_spark.sources.rest import (
        bulk_get_rest,
        check_and_put_rest,
        ensure_rest_server,
        increment_rest,
        read_table_rest,
        read_table_rest_versions,
    )

    root = root or tempfile.mkdtemp(prefix="shc_rest_ops_")
    cat = json.dumps(
        {
            "table": {"namespace": "ex", "name": "counters", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "user": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "clicks": {"cf": "cf", "col": "c", "type": "bigint"},
                "plan": {"cf": "cf", "col": "p", "type": "string"},
            },
        }
    )
    base = spark.range(100).select(
        F.col("id").alias("user"),
        (F.col("id") % 3).cast("long").alias("clicks"),
        F.lit("free").alias("plan"),
    )
    write_table(base, cat, root=root, num_regions=4, mode="overwrite", timestamp=1000)
    url = ensure_rest_server(root)

    # 1. bulk multiget: one round trip, missing key absent
    got = {r["user"]: r for r in bulk_get_rest(spark, cat, url, [7, 42, 9999]).collect()}
    assert set(got) == {7, 42} and got[7]["clicks"] == 7 % 3
    print("multiget: 2 of 3 keys exist ->", sorted(got))

    # 2. atomic batch increment: one generation for the whole batch
    out = increment_rest(cat, url, [(7, "clicks", 10), (7, "clicks", 5), (42, "clicks", 1)])
    assert out[(7, "clicks")] == 7 % 3 + 15
    print("increment: user 7 clicks ->", out[(7, "clicks")])

    # 3. CAS: upgrade user 42's plan iff it is still 'free'
    assert check_and_put_rest(cat, url, 42, "plan", "free", "pro") is True
    assert check_and_put_rest(cat, url, 42, "plan", "free", "enterprise") is False
    merged = {r["user"]: r for r in read_table_rest(spark, cat, url).collect()}
    assert merged[42]["plan"] == "pro" and merged[7]["clicks"] == 16
    print("checkAndPut: second CAS refused, plan =", merged[42]["plan"])

    # 4. version scan: user 7's click history (base + increment)
    hist = (
        read_table_rest_versions(spark, cat, url, max_versions=3)
        .filter(F.col("user") == 7)
        .orderBy("__ts")
        .collect()
    )
    assert [r["clicks"] for r in hist] == [7 % 3, 16]
    print("version scan: user 7 history =", [(r["__ts"], r["clicks"]) for r in hist])
    print("rest_serving_ops example OK")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from shc_spark.session import get_spark

    main(get_spark("example-rest-ops", cpus=8))
