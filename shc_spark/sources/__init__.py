from shc_spark.sources.api import read_table, register, write_table
from shc_spark.sources.shc_source import ShcDataSource

__all__ = ["ShcDataSource", "read_table", "register", "write_table"]
