"""JoinTablesFrom2Clusters.scala analog: federation. Two tables live
under DIFFERENT roots (the embedded stand-in for two HBase clusters /
two hbase-site configs); each side's filter pushes into ITS root's
region pruning, and the join runs in Spark above both sources.

Expected result mirrors the reference example: rows 101..120.

Run: python examples/join_two_clusters.py
"""

import json
import tempfile


def _cat(name):
    return json.dumps(
        {
            "table": {"namespace": "ex", "name": name, "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "col0": {"cf": "rowkey", "col": "key", "type": "string"},
                "col2": {"cf": "cf2", "col": "col2", "type": "double"},
                "col5": {"cf": "cf5", "col": "col5", "type": "bigint"},
            },
        }
    )


def main(spark, root1=None, root2=None):
    from pyspark.sql import functions as F

    from shc_spark.sources import read_table, write_table

    root1 = root1 or tempfile.mkdtemp(prefix="shc_cluster1_")
    root2 = root2 or tempfile.mkdtemp(prefix="shc_cluster2_")

    mk = lambda lo, hi: spark.createDataFrame(
        [("row%03d" % i, float(i), i) for i in range(lo, hi + 1)],
        "col0 string, col2 double, col5 long",
    )
    write_table(mk(0, 120), _cat("t1"), root=root1, num_regions=5, mode="overwrite")
    write_table(mk(100, 200), _cat("t2"), root=root2, num_regions=5, mode="overwrite")

    df1 = read_table(spark, _cat("t1"), root=root1)
    df2 = read_table(spark, _cat("t2"), root=root2)
    s1 = df1.filter((F.col("col0") <= "row120") & (F.col("col0") > "row090")).select("col0", "col2")
    s2 = df2.filter((F.col("col0") <= "row150") & (F.col("col0") > "row100")).select("col0", "col5")
    result = s1.join(s2, ["col0"]).sort("col0")

    got = [r["col0"] for r in result.collect()]
    assert got == ["row%03d" % i for i in range(101, 121)], got
    print("join_two_clusters: OK (rows 101..120)")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-join2", cpus=8))
