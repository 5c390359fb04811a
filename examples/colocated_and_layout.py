"""Round-4 feature showcase — the two scan-level scale features plus
the substring-dedup pipeline:

1. Z-ORDER LAYOUT + Z-RANGE BOX QUERY: cluster a 2-D table by Morton
   code, store it z-KEYED (rowkey = (zval, id)), and run a box
   predicate through layout.zbox_filter — the z-ranges prune regions,
   the exact bounds keep semantics exact.
2. CO-LOCATED JOIN: two identically-keyed shc tables joined INSIDE
   the scan (format "shc_join") — zero Spark exchanges, verified on
   the executed plan.
3. SUBSTRING DEDUP: duplicate_spans finds cross-document repeated
   token runs; remove_spans rewrites with a keep-one-copy policy.

Run: python examples/colocated_and_layout.py
"""

import json


def _cat(name, value_cols):
    return json.dumps(
        {
            "table": {"namespace": "ex", "name": name, "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "zval:gid",
            "columns": {
                "zval": {"cf": "rowkey", "col": "zval", "type": "bigint"},
                "gid": {"cf": "rowkey", "col": "gid", "type": "bigint"},
                **value_cols,
            },
        }
    )


def main(spark, root=None):
    import tempfile

    from pyspark.sql import functions as F

    from shc_spark.operators import dedup, layout
    from shc_spark.sources import colocated_join, read_table, write_table

    root = root or tempfile.mkdtemp(prefix="shc_coloc_ex_")

    # -- 1. z-keyed layout + box query ----------------------------------
    grid = spark.range(64 * 64).select(
        F.col("id").alias("gid"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    zed = grid.withColumn("zval", layout.zvalue(["x", "y"], bits=6))
    cat_a = _cat("zgrid", {
        "x": {"cf": "cf", "col": "x", "type": "bigint"},
        "y": {"cf": "cf", "col": "y", "type": "bigint"},
    })
    write_table(zed.select("zval", "gid", "x", "y"), cat_a, root=root,
                num_regions=8, mode="overwrite", timestamp=1)
    box = layout.zbox_filter(["x", "y"], [10, 20], [25, 43], bits=6)
    hits = read_table(spark, cat_a, root=root).filter(box)
    n = hits.count()
    assert n == (25 - 10 + 1) * (43 - 20 + 1), n

    # -- 2. co-located join (zero shuffles) -----------------------------
    cat_b = _cat("zgrid_w", {"w": {"cf": "cf", "col": "w", "type": "double"}})
    write_table(
        zed.filter(F.col("gid") % 2 == 0).select(
            "zval", "gid", (F.col("x") * 1.5).alias("w")
        ),
        cat_b, root=root, num_regions=5, mode="overwrite", timestamp=1,
    )
    j = colocated_join(spark, cat_a, cat_b, root=root, how="inner")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert j.count() == 64 * 64 // 2

    # -- 3. substring dedup with keep-one-copy --------------------------
    docs = spark.createDataFrame(
        [
            (1, "press release the quick brown fox jumps today"),
            (2, "breaking news the quick brown fox jumps again"),
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    spans = dedup.duplicate_spans(docs, k=3, scope="cross_doc")
    drop = spans.join(
        spans.groupBy("start_tok").agg(F.min("doc_id").alias("keep_id")),
        "start_tok",
    ).filter(F.col("doc_id") != F.col("keep_id")).select(
        "doc_id", "start_tok", "end_tok"
    )
    clean = {r.doc_id: r.text_clean
             for r in dedup.remove_spans(docs, drop).collect()}
    assert "quick brown fox" in clean[1]  # canonical copy kept
    assert "quick brown fox" not in clean[2]  # duplicate removed
    assert clean[3] == "nothing shared here at all"

    print(f"colocated_and_layout: OK (box {n} rows, join shuffle-free, dedup kept one copy)")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-coloc", cpus=8))
