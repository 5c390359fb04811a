"""AvroSource.scala analog: whole Avro records serialized into ONE
cell, nested array/map access and filters on nested fields running in
Spark above the scan (AvroSourceSuite.scala:133-154 semantics).

Run: python examples/avro_source.py
"""

import json
import tempfile

AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "user",
        "fields": [
            {"name": "name", "type": "string"},
            {"name": "favorite_number", "type": ["int", "null"]},
            {"name": "favorite_array", "type": {"type": "array", "items": "string"}},
            {"name": "favorite_map", "type": {"type": "map", "values": "int"}},
        ],
    }
)

CATALOG = json.dumps(
    {
        "table": {"namespace": "ex", "name": "avro", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "col0": {"cf": "rowkey", "col": "key", "type": "string"},
            "col1": {"cf": "cf1", "col": "col1", "avro": "avroSchema"},
        },
        "avroSchema": AVRO_SCHEMA,
    }
)

SCHEMA = (
    "col0 string, col1 struct<name:string, favorite_number:int, "
    "favorite_array:array<string>, favorite_map:map<string,int>>"
)


def main(spark, root=None):
    from pyspark.sql import functions as F

    from shc_spark.sources import read_table, write_table

    root = root or tempfile.mkdtemp(prefix="shc_ex_avro_")
    data = [
        (f"name{i:03d}", (f"name{i}", i, [f"name{i}", f"extra{i}"], {"key1": i, "key2": i + 1}))
        for i in range(256)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    write_table(df, CATALOG, root=root, num_regions=5, mode="overwrite")

    t = read_table(spark, CATALOG, root=root)
    assert t.count() == 256
    # nested access + filter on a nested field, Spark-side
    sub = t.select(
        F.col("col1.favorite_array").getItem(0).alias("first"),
        F.col("col1.favorite_map").getItem("key2").alias("k2"),
    ).filter(F.col("col1.favorite_number") > 250)
    got = sorted((r["first"], r["k2"]) for r in sub.collect())
    assert got == [(f"name{i}", i + 1) for i in range(251, 256)], got
    print("avro_source: OK")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-avro", cpus=8))
