"""The full storage lifecycle — capabilities beyond the reference
(which delegates all of this to HBase itself): append generations,
delete tombstones, secondary-index lookups, incremental rollup,
major compaction, vacuum, snapshot export.

Run: python examples/storage_lifecycle.py
"""

import json
import tempfile

CATALOG = json.dumps(
    {
        "table": {"namespace": "ex", "name": "life", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "k": {"cf": "rowkey", "col": "key", "type": "int"},
            "seg": {"cf": "cf", "col": "s", "type": "string"},
            "v": {"cf": "cf", "col": "v", "type": "double"},
        },
    }
)


def main(spark, root=None):
    import os

    from pyspark.sql import functions as F

    from shc_spark.sources import (
        SecondaryIndex,
        compact_table,
        delete_rows,
        export_snapshot,
        read_table,
        vacuum_table,
        write_table,
    )

    root = root or tempfile.mkdtemp(prefix="shc_ex_life_")
    segs = ["red", "green", "blue"]
    mk = lambda lo, hi, m: spark.createDataFrame(
        [(i, segs[i % 3], float(i * m)) for i in range(lo, hi)], "k int, seg string, v double"
    )

    # 1. bulk load + append (LSM generations)
    write_table(mk(0, 100, 1), CATALOG, root=root, num_regions=4, timestamp=1000)
    write_table(mk(50, 120, 10), CATALOG, root=root, mode="append", timestamp=2000)
    assert read_table(spark, CATALOG, root=root).count() == 120

    # 2. delete: tombstones mask on merge reads
    delete_rows(spark, CATALOG, list(range(0, 10)), root=root, timestamp=3000)
    assert read_table(spark, CATALOG, root=root).count() == 110

    # 3. secondary index: lookup by segment without scanning the base
    ix = SecondaryIndex(spark, CATALOG, "seg", root=root)
    ix.build()
    reds = ix.lookup("red")
    assert reds.count() == read_table(spark, CATALOG, root=root).filter(
        F.col("seg") == "red"
    ).count()

    # 4. major compaction: 3 generations -> 1, deletes purged
    compact_table(spark, CATALOG, root=root, num_regions=4)
    path = os.path.join(root, "ex.life")
    gens = [e for e in os.listdir(path) if e.startswith("gen=")]
    assert len(gens) == 1
    assert read_table(spark, CATALOG, root=root).count() == 110

    # 5. vacuum (nothing to collect after compaction's own cleanup)
    assert vacuum_table(CATALOG, root=root, grace_seconds=0) == []

    # 6. export the logical view as plain parquet for outside consumers
    dest = os.path.join(root, "export")
    export_snapshot(spark, CATALOG, dest, root=root)
    assert spark.read.parquet(dest).count() == 110
    print("storage_lifecycle: OK")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-lifecycle", cpus=8))
