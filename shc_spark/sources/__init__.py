from shc_spark.sources.api import (
    apply_cdc,
    bulk_get,
    compact_table,
    count_rows,
    delete_rows,
    diff_tables,
    export_snapshot,
    import_snapshot,
    merge_into,
    read_stream_table,
    read_table,
    register,
    vacuum_table,
    write_stream_cdc,
    write_stream_table,
    write_table,
)
from shc_spark.sources.colocated import ShcJoinDataSource, colocated_join
from shc_spark.sources.index import SecondaryIndex
from shc_spark.sources.shc_source import ShcDataSource

__all__ = [
    "SecondaryIndex",
    "apply_cdc",
    "ShcDataSource",
    "ShcJoinDataSource",
    "colocated_join",
    "bulk_get",
    "compact_table",
    "count_rows",
    "delete_rows",
    "diff_tables",
    "export_snapshot",
    "import_snapshot",
    "merge_into",
    "read_stream_table",
    "read_table",
    "register",
    "vacuum_table",
    "write_stream_cdc",
    "write_stream_table",
    "write_table",
]
