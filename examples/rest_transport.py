"""The remote-transport story end to end: one table served over the
HBase REST (Stargate) protocol by the in-repo mock region server —
scan parity, range pushdown that opens fewer scanners, Put batches
committed as one generation, the coprocessor-style server-side
aggregation whose 5.8x wire win SCALE.md records, region locality
hints, and exactly-once recovery across a mid-scan scanner purge.

Run: python examples/rest_transport.py
"""

import json
import tempfile

CATALOG = json.dumps(
    {
        "table": {"namespace": "ex", "name": "restt", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "k": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "grp": {"cf": "cf", "col": "g", "type": "string"},
            "val": {"cf": "cf", "col": "v", "type": "double"},
        },
    }
)


def main(spark, root=None):
    from pyspark.sql import functions as F

    from shc_spark.sources import read_table, write_table
    from shc_spark.sources.rest import (
        ensure_rest_server,
        read_table_rest,
        scan_aggregate_rest,
        write_table_rest,
    )

    root = root or tempfile.mkdtemp(prefix="shc_rest_ex_")
    base = spark.range(500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("grp"),
        (F.col("id") * 1.25).alias("val"),
    )
    write_table(base, CATALOG, root=root, num_regions=8, mode="overwrite", timestamp=1000)
    url = ensure_rest_server(root)
    print("mock region server:", url)

    # 1. scan parity: the wire never changes an answer
    via_rest = read_table_rest(spark, CATALOG, url)
    assert via_rest.count() == 500
    a = sorted(tuple(r) for r in via_rest.collect())
    b = sorted(tuple(r) for r in read_table(spark, CATALOG, root=root).collect())
    assert a == b
    print("scan parity: 500 rows identical through both transports")

    # 2. range pushdown -> scanner startRow/stopRow, fewer scanners
    sub = via_rest.filter((F.col("k") >= 100) & (F.col("k") < 150))
    got = sorted(r["k"] for r in sub.collect())
    assert got == list(range(100, 150))
    print("pushdown: k in [100,150) returned exactly", len(got), "rows")

    # 3. Put batches over the wire -> one generation at flush
    upd = spark.range(50).select(
        F.col("id").alias("k"), F.lit("hot").alias("grp"), F.lit(0.0).alias("val")
    )
    write_table_rest(upd, CATALOG, url, timestamp=2000)
    merged = {r["k"]: r["grp"] for r in read_table_rest(spark, CATALOG, url).collect()}
    assert sum(1 for g in merged.values() if g == "hot") == 50
    print("wire write: 50 Puts merged latest-wins, visible to both transports")

    # 4. coprocessor-style server-side aggregation: rows never cross
    agg = scan_aggregate_rest(
        spark, CATALOG, url, ["grp"], [("count", "*"), ("sum", "val"), ("avg", "val")]
    )
    rows = {r["grp"]: r for r in agg.collect()}
    exp = {
        r["grp"]: r
        for r in read_table(spark, CATALOG, root=root)
        .groupBy("grp")
        .agg(F.count("*").alias("count_all"), F.sum("val").alias("s"), F.avg("val").alias("a"))
        .collect()
    }
    assert set(rows) == set(exp) and all(
        rows[g]["count_all"] == exp[g]["count_all"]
        and abs(rows[g]["sum_val"] - exp[g]["s"]) < 1e-6
        for g in rows
    )
    print("server-side aggregate:", {g: rows[g]["count_all"] for g in sorted(rows)})

    # 5. r12: region locality hints + scanner-eviction recovery — the
    # failure/affinity semantics a real cluster adds. Partitions carry
    # the serving host (preferred_locations); killing every server-side
    # scanner mid-scan still returns exactly the remaining rows (the
    # reader reopens from the last served row).
    import urllib.request

    from shc_spark.sources.rest import ShcRestReader

    rdr = ShcRestReader(None, {"catalog": CATALOG, "url": url, "batch": "64"})
    parts = rdr.partitions()
    hosts = {h for p in parts for h in p.preferred_locations()}
    assert hosts, "regions must carry serving hosts"
    print("locality: partitions prefer", sorted(hosts))
    seen = 0
    for pi, part in enumerate(parts):
        gen = rdr.read(part)
        first = next(gen, None)
        if first is not None:
            seen += first.num_rows
            if pi == 0:  # evict every live scanner once, mid-scan
                for _ in range(600):
                    req = urllib.request.Request(
                        f"{url}/ex.restt/scanner",
                        data=json.dumps({"batch": 1}).encode(),
                        method="POST",
                        headers={"Content-Type": "application/json"},
                    )
                    urllib.request.urlopen(req).close()
            for batch in gen:
                seen += batch.num_rows
    assert seen == 500, seen
    print("eviction recovery: 500/500 rows across a full scanner purge")
    print("rest_transport example OK")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from shc_spark.session import get_spark

    main(get_spark("example-rest", cpus=8))
