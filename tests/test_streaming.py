"""Streaming layer tests: windowed/sessionized/stateful results
converge to batch answers (checked by the oracle gate too), and the
shc streaming sink writes generations per microbatch."""

import json

from pyspark.sql import functions as F

from shc_spark.sources import read_table
from shc_spark.streaming import stream_events, stream_write_table

SF = "/root/testdata/sf0.001"


def test_stream_events_schema(spark):
    ev = stream_events(spark, SF)
    assert ev.isStreaming
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_stream_write_table_roundtrip(spark, tmp_path):
    cat = json.dumps(
        {
            "table": {"namespace": "s", "name": "ev", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "event_id": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "user_id": {"cf": "cf", "col": "u", "type": "bigint"},
                "event_type": {"cf": "cf", "col": "t", "type": "string"},
                "value": {"cf": "cf", "col": "v", "type": "double"},
            },
        }
    )
    root = str(tmp_path / "tables")
    ev = stream_events(spark, SF).select("event_id", "user_id", "event_type", "value")
    q = stream_write_table(ev, cat, root=root, checkpoint=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    back = read_table(spark, cat, root=root)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    n_expected = spark.read.parquet(f"{SF}/events.parquet").count()
    assert back.count() == n_expected
    # pushdown works on the streamed-in table too
    one = back.filter(F.col("event_id") == 7).collect()
    assert len(one) == 1 and one[0]["user_id"] is not None
