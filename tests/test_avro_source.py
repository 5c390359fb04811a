"""Avro-coded cell roundtrip through the shc source — model:
AvroSourceSuite.scala:105-192 (write records, read back, nested
array/map access, filters on nested fields)."""

import json

from pyspark.sql import functions as F

from shc_spark.sources import read_table, write_table

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

CAT = json.dumps(
    {
        "table": {"namespace": "default", "name": "avro_t", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "key": {"cf": "rowkey", "col": "key", "type": "string"},
            "col1": {"cf": "cf1", "col": "c1", "avro": "schema1"},
        },
        "schema1": AVRO_SCHEMA,
    }
)

SCHEMA = (
    "key string, col1 struct<name:string, favorite_number:int, "
    "favorite_array:array<string>, favorite_map:map<string,int>>"
)


def rows(n=32):
    return [
        (
            f"name{i:03d}",
            (f"name{i}", i if i % 3 else None, [f"name{i}", f"extra{i}"], {f"name{i}": i, "k": i * 2}),
        )
        for i in range(n)
    ]


def test_avro_roundtrip_through_source(spark, tmp_path):
    root = str(tmp_path)
    df = spark.createDataFrame(rows(), schema=SCHEMA)
    write_table(df, CAT, root=root, num_regions=4, mode="overwrite")

    # NOTE: a fresh read_table per logical query — Spark 4.1 caches the
    # planned scan per relation, so reusing one loaded DataFrame across
    # differently-filtered queries reuses stale pruning (see
    # ShcReader.pushFilters docstring)
    assert read_table(spark, CAT, root=root).count() == 32
    # physical storage really is one Avro binary per cell
    raw = spark.read.format("shc").option("catalog", CAT).option("root", root).load()
    assert dict(raw.dtypes)["col1"] == "binary"

    # nested access (AvroSourceSuite.scala:133-154)
    r5 = read_table(spark, CAT, root=root).filter(F.col("key") == "name005").select(
        "key", "col1.name", "col1.favorite_number", "col1.favorite_array"
    ).collect()[0]
    assert r5["name"] == "name5"
    assert r5["favorite_number"] == 5
    assert r5["favorite_array"] == ["name5", "extra5"]

    # union-with-null roundtrip: i % 3 == 0 -> null favorite_number
    back = read_table(spark, CAT, root=root)
    assert back.filter(F.col("col1.favorite_number").isNull()).count() == 11

    # map access
    m = read_table(spark, CAT, root=root).filter(F.col("key") == "name004").select(
        F.col("col1.favorite_map").getItem("k").alias("k")
    ).collect()[0]
    assert m["k"] == 8

    # filter on nested field + rowkey pushdown combined
    got = read_table(spark, CAT, root=root).filter(
        (F.col("key") >= "name010") & (F.col("col1.favorite_number") == 11)
    ).count()
    assert got == 1
