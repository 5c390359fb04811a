"""LRJobForDataSources.scala analog (single iteration): one query
plan spanning heterogeneous sources — a plain parquet table (the
reference uses a Hive/HDFS table) joined against an shc table, with
each side's filters pushed into its own source.

Run: python examples/mixed_sources.py
"""

import json
import os
import tempfile

CATALOG = json.dumps(
    {
        "table": {"namespace": "ex", "name": "lr", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "key": {"cf": "rowkey", "col": "key", "type": "int"},
            "col1": {"cf": "cf1", "col": "col1", "type": "boolean"},
            "col2": {"cf": "cf2", "col": "col2", "type": "double"},
        },
    }
)


def main(spark, root=None):
    from pyspark.sql import functions as F

    from shc_spark.sources import read_table, write_table

    root = root or tempfile.mkdtemp(prefix="shc_ex_mixed_")

    # side 1: a plain parquet table (the Hive/HDFS stand-in)
    pq_dir = os.path.join(root, "hive_like")
    spark.createDataFrame(
        [(i, i % 2 == 0, float(i)) for i in range(1, 41)], "key int, col1 boolean, col2 double"
    ).write.mode("overwrite").parquet(pq_dir)
    df1 = spark.read.parquet(pq_dir)

    # side 2: an shc table
    write_table(
        spark.createDataFrame(
            [(i, i % 3 == 0, float(i * 10)) for i in range(41)],
            "key int, col1 boolean, col2 double",
        ),
        CATALOG, root=root, num_regions=5, mode="overwrite",
    )
    df2 = read_table(spark, CATALOG, root=root)

    # one plan over both: parquet-side filter prunes row groups,
    # shc-side filter prunes regions, join happens above
    s1 = df1.filter(F.col("key") <= 40).select("key", "col1")
    s2 = df2.filter((F.col("key") <= 20) & (F.col("key") >= 1)).select("key", "col2")
    result = s1.join(s2, ["key"]).orderBy("key")
    rows = result.collect()
    assert [r["key"] for r in rows] == list(range(1, 21))
    assert rows[4]["col2"] == 50.0
    print("mixed_sources: OK (20 joined rows across parquet + shc)")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-mixed", cpus=8))
