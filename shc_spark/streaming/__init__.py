from shc_spark.streaming.events import (
    run_sessionization,
    run_stream_dedup,
    run_stream_decontaminate,
    run_stream_dq_monitor,
    run_stream_incremental_dedup,
    run_stream_quality_by_source,
    run_stateful_totals,
    run_streaming_embed_drift,
    run_tumbling_counts,
    stream_events,
    stream_write_table,
)
from shc_spark.streaming.rollup import IncrementalRollup

__all__ = [
    "IncrementalRollup",
    "run_sessionization",
    "run_stream_dedup",
    "run_stream_decontaminate",
    "run_stream_dq_monitor",
    "run_stream_incremental_dedup",
    "run_stream_quality_by_source",
    "run_stateful_totals",
    "run_streaming_embed_drift",
    "run_tumbling_counts",
    "stream_events",
    "stream_write_table",
]
