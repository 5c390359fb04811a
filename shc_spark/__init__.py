"""shc_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hortonworks-spark/shc.

Two layers (see SURVEY.md):

1. Connector layer (``shc_spark.catalog``, ``shc_spark.coders``,
   ``shc_spark.sources``): the reference's HBase-connector surface —
   JSON catalog -> StructType, type coders, Spark-Filter -> rowkey-range
   pushdown, partition pruning — re-expressed over the Python Data
   Source API with an embedded sorted-KV parquet backend.

2. Operator layer (``shc_spark.operators``, ``shc_spark.functions``,
   ``shc_spark.streaming``): the relational surface the reference
   delegates to Catalyst (joins, aggregation, SQL, windows, set ops)
   plus the large-scale training-data-pipeline operators (dedup,
   similarity search, text analysis, multimodal columns).

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API so Catalyst + Tungsten pick the physical strategy.
"""

__version__ = "0.1.0"
