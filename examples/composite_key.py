"""CompositeKey.scala analog: 2-dimension rowkey (fixed-width string
prefix + int tail); predicates on the FIRST dimension prune regions,
later dimensions are re-filtered by Spark (CompositeKeySuite.scala
semantics, expected counts :100-179).

Run: python examples/composite_key.py
"""

import json
import tempfile

CATALOG = json.dumps(
    {
        "table": {"namespace": "ex", "name": "composite", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key1:key2",
        "columns": {
            "col00": {"cf": "rowkey", "col": "key1", "type": "string", "length": "6"},
            "col01": {"cf": "rowkey", "col": "key2", "type": "int"},
            "col1": {"cf": "cf1", "col": "col1", "type": "double"},
        },
    }
)


def main(spark, root=None):
    from pyspark.sql import functions as F

    from shc_spark.sources import read_table, write_table

    root = root or tempfile.mkdtemp(prefix="shc_ex_ck_")
    rows = [("row%03d" % i, i if i % 2 == 0 else -i, float(i)) for i in range(256)]
    df = spark.createDataFrame(rows, "col00 string, col01 int, col1 double")
    write_table(df, CATALOG, root=root, num_regions=4, mode="overwrite")

    t = read_table(spark, CATALOG, root=root)
    assert t.count() == 256
    # first dim prunes; second dim re-filtered by Spark
    assert t.filter((F.col("col00") <= "row050") & (F.col("col01") > 40)).count() == 5
    assert t.filter((F.col("col00") == "row010") & (F.col("col01") == 10)).count() == 1
    print("composite_key: OK")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-ck", cpus=8))
