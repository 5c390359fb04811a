"""HBaseSource.scala analog: write a 256-row table through the
connector, read it back with pushed-down filters and SQL over a temp
view. Expected counts mirror DefaultSourceSuite.scala:206-262.

Run: python examples/basic_source.py
"""

import json
import tempfile

CATALOG = json.dumps(
    {
        "table": {"namespace": "ex", "name": "basic", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "col0": {"cf": "rowkey", "col": "key", "type": "string"},
            "col1": {"cf": "cf1", "col": "col1", "type": "boolean"},
            "col2": {"cf": "cf2", "col": "col2", "type": "double"},
            "col4": {"cf": "cf4", "col": "col4", "type": "int"},
        },
    }
)


def main(spark, root=None):
    from pyspark.sql import functions as F

    from shc_spark.sources import read_table, write_table

    root = root or tempfile.mkdtemp(prefix="shc_ex_")
    rows = [("row%03d" % i, i % 2 == 0, float(i), i) for i in range(256)]
    df = spark.createDataFrame(rows, "col0 string, col1 boolean, col2 double, col4 int")
    write_table(df, CATALOG, root=root, num_regions=5, mode="overwrite")

    # one fresh relation per logical query (README "Known sharp edge":
    # Spark caches planned partitions per Python-DS relation, so a
    # reused DataFrame could replay another query's pruning)
    t = lambda: read_table(spark, CATALOG, root=root)
    assert t().count() == 256
    assert t().filter(F.col("col0") <= "row005").count() == 6  # range pushdown
    assert t().filter((F.col("col0") > "row250") | (F.col("col4") < 2)).count() == 7

    t().createOrReplaceTempView("table1")
    n = spark.sql("select count(col1) from table1 where col0 < 'row050'").collect()[0][0]
    assert n == 50
    print("basic_source: OK")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-basic", cpus=8))
