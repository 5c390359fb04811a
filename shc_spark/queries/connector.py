"""Connector-layer correctness queries (SURVEY.md §2.1 S1-S19):
write a testdata-derived table through the "shc" data source, read it
back with pushdown/pruning in play, and compare against DuckDB running
the equivalent SQL directly on the source parquet. A value surviving
the encode -> region-split -> sorted-write -> range-scan -> merge
pipeline unchanged is the roundtrip proof.

Each query materializes its table under /tmp keyed by (table, sf_dir)
and rewrites it only when absent, so repeated runs are cheap and
deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shc_spark.io import read_parquet
from shc_spark.sources import read_table, write_table

QUERIES: dict = {}
ORACLE: dict = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _root(sf_dir: str, tag: str) -> str:
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/shc_tables_{tag}_{h}"


CAT_CUSTOMER = json.dumps(
    {
        "table": {"namespace": "q", "name": "customer", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "c_name": {"cf": "cf", "col": "name", "type": "string"},
            "c_nationkey": {"cf": "cf", "col": "nk", "type": "int"},
            "c_acctbal": {"cf": "cf", "col": "bal", "type": "double"},
            "c_mktsegment": {"cf": "cf", "col": "seg", "type": "string"},
        },
    }
)

CAT_ORDERS_CK = json.dumps(
    {
        "table": {"namespace": "q", "name": "orders_ck", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key1:key2",
        "columns": {
            "o_custkey": {"cf": "rowkey", "col": "key1", "type": "bigint"},
            "o_orderkey": {"cf": "rowkey", "col": "key2", "type": "bigint"},
            "o_totalprice": {"cf": "cf", "col": "tp", "type": "double"},
            "o_orderstatus": {"cf": "cf", "col": "st", "type": "string"},
        },
    }
)


def _ensure_customer(spark: SparkSession, sf_dir: str) -> str:
    root = _root(sf_dir, "cust")
    if not os.path.exists(os.path.join(root, "q.customer", "_regions.json")):
        df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet"))
        write_table(
            df.select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
            CAT_CUSTOMER,
            root=root,
            num_regions=8,
            mode="overwrite",
            timestamp=1000,
        )
    return root


def _ensure_orders_ck(spark: SparkSession, sf_dir: str) -> str:
    root = _root(sf_dir, "ordck")
    if not os.path.exists(os.path.join(root, "q.orders_ck", "_regions.json")):
        df = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
        write_table(
            df.select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus"),
            CAT_ORDERS_CK,
            root=root,
            num_regions=8,
            mode="overwrite",
            timestamp=1000,
        )
    return root


# S1/S2/S4/S13: full write-read roundtrip, every value bit-identical.
@register(
    "shc_roundtrip_scan",
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def shc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_customer(spark, sf_dir)
    return read_table(spark, CAT_CUSTOMER, root=root)


# S6/S8/S10: range + IN pushdown with region pruning on the rowkey.
@register(
    "shc_pushdown_range",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE (c_custkey > 100 AND c_custkey <= 300) OR c_custkey IN (7, 11, 1200)
    """,
)
def shc_pushdown_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_customer(spark, sf_dir)
    t = read_table(spark, CAT_CUSTOMER, root=root)
    return t.filter(
        ((F.col("c_custkey") > 100) & (F.col("c_custkey") <= 300))
        | F.col("c_custkey").isin(7, 11, 1200)
    ).select("c_custkey", "c_name", "c_acctbal")


# S5 + §2.2 string filters on value columns (Spark re-evaluates above scan).
@register(
    "shc_value_filters",
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment LIKE 'BUIL%' AND c_acctbal >= 0 AND c_custkey < 800
    """,
)
def shc_value_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_customer(spark, sf_dir)
    t = read_table(spark, CAT_CUSTOMER, root=root)
    return t.filter(
        F.col("c_mktsegment").startswith("BUIL")
        & (F.col("c_acctbal") >= 0)
        & (F.col("c_custkey") < 800)
    ).select("c_custkey", "c_mktsegment")


# S19: composite rowkey — first-dim pruning + second-dim re-filter
# (CompositeKeySuite semantics on real data).
@register(
    "shc_composite_key",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_custkey <= 50 AND o_orderkey % 2 = 0
    """,
)
def shc_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_orders_ck(spark, sf_dir)
    t = read_table(spark, CAT_ORDERS_CK, root=root)
    return t.filter((F.col("o_custkey") <= 50) & (F.col("o_orderkey") % 2 == 0))


# S14/S15: versioned append + merge-to-latest. Gen2 updates c_name for
# custkey%10==0 (other cells null => not stored => old values survive).
@register(
    "shc_version_merge",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN concat(c_name, ':v2') ELSE c_name END AS name_latest,
           c_acctbal
    FROM customer
    """,
)
def shc_version_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _root(sf_dir, "custv")
    marker = os.path.join(root, "q.customer", "_regions.json")

    def _gen_count() -> int:
        if not os.path.exists(marker):
            return 0
        with open(marker) as fh:
            regions = json.load(fh)
        return len({os.path.dirname(r["path"]) for r in regions})

    if _gen_count() < 2:
        df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
            "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
        )
        write_table(df, CAT_CUSTOMER, root=root, num_regions=8, mode="overwrite", timestamp=1000)
        gen2 = df.filter(F.col("c_custkey") % 10 == 0).select(
            "c_custkey",
            F.concat(F.col("c_name"), F.lit(":v2")).alias("c_name"),
            F.lit(None).cast("int").alias("c_nationkey"),
            F.lit(None).cast("double").alias("c_acctbal"),
            F.lit(None).cast("string").alias("c_mktsegment"),
        )
        write_table(gen2, CAT_CUSTOMER, root=root, timestamp=2000)
    t = read_table(spark, CAT_CUSTOMER, root=root)
    return t.select(
        "c_custkey", F.col("c_name").alias("name_latest"), "c_acctbal"
    )


# S15 time travel: reading AS OF ts=1000 hides the v2 generation.
@register(
    "shc_time_travel",
    "SELECT c_custkey, c_name FROM customer",
)
def shc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    shc_version_merge(spark, sf_dir)  # ensure both generations exist
    root = _root(sf_dir, "custv")
    t = read_table(spark, CAT_CUSTOMER, root=root, max_stamp=1001)
    return t.select("c_custkey", "c_name")


# S14 version explode: merge_to_latest=False yields one row PER
# WRITTEN VERSION (multiset — deliberate divergence from the
# reference's lossy Set[Row], HBaseTableScan.scala:245; replays the
# MaxVersionsSuite.scala:45-98 generation matrix as a driver gate).
# Keys with c_custkey%10==0 carry two generations: ts=2000 wrote only
# c_name (':v2'), so that version row has NULL acctbal — cells do NOT
# merge across versions in explode mode.
@register(
    "shc_version_explode",
    """
    SELECT c_custkey, 1 AS version_rank,
           concat(c_name, ':v2') AS name_v,
           CAST(NULL AS DOUBLE) AS bal_v
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END AS version_rank,
           c_name AS name_v, c_acctbal AS bal_v
    FROM customer
    """,
)
def shc_version_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    shc_version_merge(spark, sf_dir)  # ensure both generations exist
    root = _root(sf_dir, "custv")
    t = read_table(
        spark, CAT_CUSTOMER, root=root, merge_to_latest=False, keep_internal=True
    )
    w = Window.partitionBy("c_custkey").orderBy(F.col("__ts").desc())
    return t.select(
        "c_custkey",
        F.row_number().over(w).alias("version_rank"),
        F.col("c_name").alias("name_v"),
        F.col("c_acctbal").alias("bal_v"),
    )


CAT_PART_AVRO = json.dumps(
    {
        "table": {"namespace": "q", "name": "part_avro", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "p_partkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "p_info": {"cf": "cf", "col": "info", "avro": "schema_part"},
        },
        "schema_part": json.dumps(
            {
                "type": "record",
                "name": "partinfo",
                "fields": [
                    {"name": "p_brand", "type": "string"},
                    {"name": "p_type", "type": ["string", "null"]},
                    {"name": "p_retailprice", "type": "double"},
                ],
            }
        ),
    }
)


# S17 Avro serde: struct cell -> Avro binary -> struct, nested access +
# filter on a nested field (AvroSourceSuite.scala:105-192 on real data).
@register(
    "shc_avro_cells",
    """
    SELECT p_partkey, p_brand, p_type, p_retailprice
    FROM part WHERE p_retailprice > 950 AND p_brand = 'Brand#2'
    """,
)
def shc_avro_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _root(sf_dir, "partavro")
    if not os.path.exists(os.path.join(root, "q.part_avro", "_regions.json")):
        part = read_parquet(spark, os.path.join(sf_dir, "part.parquet"))
        df = part.select(
            "p_partkey",
            F.struct("p_brand", "p_type", "p_retailprice").alias("p_info"),
        )
        write_table(df, CAT_PART_AVRO, root=root, num_regions=4, mode="overwrite", timestamp=1000)
    t = read_table(spark, CAT_PART_AVRO, root=root)
    return t.filter(
        (F.col("p_info.p_retailprice") > 950) & (F.col("p_info.p_brand") == "Brand#2")
    ).select(
        "p_partkey",
        F.col("p_info.p_brand").alias("p_brand"),
        F.col("p_info.p_type").alias("p_type"),
        F.col("p_info.p_retailprice").alias("p_retailprice"),
    )


CAT_PART_AVRO_NESTED = json.dumps(
    {
        "table": {"namespace": "q", "name": "part_avro_nested", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "p_partkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "p_doc": {"cf": "cf", "col": "doc", "avro": "schema_doc"},
        },
        "schema_doc": json.dumps(
            {
                "type": "record",
                "name": "partdoc",
                "fields": [
                    {"name": "name", "type": "string"},
                    {"name": "sizes", "type": {"type": "array", "items": "int"}},
                    {"name": "attrs", "type": {"type": "map", "values": "int"}},
                ],
            }
        ),
    }
)


# S17 Avro serde, NESTED shapes on the r10 VECTOR path (VERDICT r9 #1:
# the reference's flagship avro usage is exactly array + map fields,
# AvroSourceSuite.scala:105-192, types/Avro.scala:83-135): array<int>
# and map<string,int> cells roundtrip through the source whole-batch
# (coders/avro.py blocked kernels) and the oracle recomputes every
# projected nested access straight from part.parquet.
@register(
    "shc_avro_nested",
    """
    SELECT p_partkey,
           p_name AS name,
           CAST(p_size + 1 AS INT) AS second_size,
           CAST(3 AS INT) AS n_sizes,
           CAST(p_size AS INT) AS attr_size,
           CAST(p_partkey % 100 AS INT) AS attr_pk
    FROM part
    WHERE p_partkey <= 800 AND p_size >= 25
    """,
)
def shc_avro_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _root(sf_dir, "partavro_nested")
    if not os.path.exists(os.path.join(root, "q.part_avro_nested", "_regions.json")):
        part = read_parquet(spark, os.path.join(sf_dir, "part.parquet"))
        df = part.select(
            "p_partkey",
            F.struct(
                F.col("p_name").alias("name"),
                F.array(
                    F.col("p_size").cast("int"),
                    (F.col("p_size") + 1).cast("int"),
                    (F.col("p_size") * 2).cast("int"),
                ).alias("sizes"),
                F.create_map(
                    F.lit("size"), F.col("p_size").cast("int"),
                    F.lit("pk"), (F.col("p_partkey") % 100).cast("int"),
                ).alias("attrs"),
            ).alias("p_doc"),
        )
        write_table(df, CAT_PART_AVRO_NESTED, root=root, num_regions=4,
                    mode="overwrite", timestamp=1000)
    t = read_table(spark, CAT_PART_AVRO_NESTED, root=root)
    return t.filter(
        (F.col("p_partkey") <= 800) & (F.element_at(F.col("p_doc.sizes"), 1) >= 25)
    ).select(
        "p_partkey",
        F.col("p_doc.name").alias("name"),
        F.element_at(F.col("p_doc.sizes"), 2).alias("second_size"),
        F.size(F.col("p_doc.sizes")).alias("n_sizes"),
        F.element_at(F.col("p_doc.attrs"), F.lit("size")).alias("attr_size"),
        F.element_at(F.col("p_doc.attrs"), F.lit("pk")).alias("attr_pk"),
    )


CAT_PART_AVRO_DEEP = json.dumps(
    {
        "table": {"namespace": "q", "name": "part_avro_deep", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "p_partkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "p_doc": {"cf": "cf", "col": "doc", "avro": "schema_deep"},
        },
        "schema_deep": json.dumps(
            {
                "type": "record",
                "name": "partdeep",
                "fields": [
                    {
                        "name": "meta",
                        "type": {
                            "type": "record",
                            "name": "meta_t",
                            "fields": [
                                {"name": "name", "type": "string"},
                                {"name": "retail", "type": ["null", "double"]},
                            ],
                        },
                    },
                    {
                        "name": "spans",
                        "type": {
                            "type": "array",
                            "items": {
                                "type": "record",
                                "name": "span_t",
                                "fields": [
                                    {"name": "pos", "type": "long"},
                                    {"name": "tag", "type": "string"},
                                ],
                            },
                        },
                    },
                    {
                        "name": "counts",
                        "type": {
                            "type": "map",
                            "values": {
                                "type": "record",
                                "name": "cnt_t",
                                "fields": [{"name": "n", "type": "int"}],
                            },
                        },
                    },
                ],
            }
        ),
    }
)


# S17 Avro serde, DEEP nested shapes on the r10 vector path (the last
# per-row family: nested records, arrays of records, maps of records —
# types/Avro.scala:83-135 recursive record conversion): a
# record-in-record with a nullable-union subfield, an array<record>
# and a map<string,record> cell all roundtrip through the source
# whole-batch (coders/avro.py recursive kernels), and the oracle
# recomputes every projected nested access straight from part.parquet.
@register(
    "shc_avro_deep",
    """
    SELECT p_partkey,
           p_name AS name,
           round(p_retailprice, 2) AS retail,
           CAST(p_size * 3 + p_partkey % 5 AS BIGINT) AS span2_pos,
           't' || CAST(p_partkey % 3 AS VARCHAR) AS span1_tag,
           CAST(p_partkey % 100 AS INT) AS k2_n
    FROM part
    WHERE p_partkey <= 800 AND p_partkey % 7 <> 0
    """,
)
def shc_avro_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _root(sf_dir, "partavro_deep")
    if not os.path.exists(os.path.join(root, "q.part_avro_deep", "_regions.json")):
        part = read_parquet(spark, os.path.join(sf_dir, "part.parquet"))
        pk = F.col("p_partkey")
        df = part.select(
            "p_partkey",
            F.struct(
                F.struct(
                    F.col("p_name").alias("name"),
                    F.when(pk % 7 == 0, F.lit(None).cast("double"))
                    .otherwise(F.round(F.col("p_retailprice"), 2))
                    .alias("retail"),
                ).alias("meta"),
                F.array(
                    F.struct(
                        F.col("p_size").cast("long").alias("pos"),
                        F.concat(F.lit("t"), (pk % 3).cast("string")).alias("tag"),
                    ),
                    F.struct(
                        (F.col("p_size") * 3 + pk % 5).cast("long").alias("pos"),
                        F.lit("u").alias("tag"),
                    ),
                ).alias("spans"),
                F.create_map(
                    F.lit("k1"),
                    F.struct((F.col("p_size") + 1).cast("int").alias("n")),
                    F.lit("k2"),
                    F.struct((pk % 100).cast("int").alias("n")),
                ).alias("counts"),
            ).alias("p_doc"),
        )
        write_table(df, CAT_PART_AVRO_DEEP, root=root, num_regions=4,
                    mode="overwrite", timestamp=1000)
    t = read_table(spark, CAT_PART_AVRO_DEEP, root=root)
    return t.filter(
        (F.col("p_partkey") <= 800) & F.col("p_doc.meta.retail").isNotNull()
    ).select(
        "p_partkey",
        F.col("p_doc.meta.name").alias("name"),
        F.col("p_doc.meta.retail").alias("retail"),
        F.element_at(F.col("p_doc.spans"), 2)["pos"].alias("span2_pos"),
        F.element_at(F.col("p_doc.spans"), 1)["tag"].alias("span1_tag"),
        F.element_at(F.col("p_doc.counts"), F.lit("k2"))["n"].alias("k2_n"),
    )


CAT_SEG_MAP = json.dumps(
    {
        "table": {"namespace": "q", "name": "seg_stats", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "c_nationkey": {"cf": "rowkey", "col": "key", "type": "int"},
            "seg_counts": {"cf": "cf1", "col": "", "type": "map<string,bigint>"},
        },
    }
)


CAT_ORDERS_TYPED = json.dumps(
    {
        "table": {"namespace": "q", "name": "orders_typed", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "o_orderkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "o_orderdate": {"cf": "cf", "col": "dt", "type": "date"},
            "o_price_dec": {"cf": "cf", "col": "pd", "type": "decimal(12,2)"},
            "o_orderpriority": {"cf": "cf", "col": "pri", "type": "string"},
        },
    }
)


# date + decimal typed value columns through the source (the §1.2 type
# matrix beyond primitives/strings): values must survive the
# encode -> region write -> scan roundtrip bit-exactly, including a
# date-range filter evaluated above the scan.
@register(
    "shc_typed_columns",
    """
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           round(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE), 2)
               AS o_price_dec,
           o_orderpriority
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
      AND o_orderkey < 2000
    """,
)
def shc_typed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _root(sf_dir, "ordtyped")
    if not os.path.exists(os.path.join(root, "q.orders_typed", "_regions.json")):
        df = read_parquet(spark, os.path.join(sf_dir, "orders.parquet")).select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("o_price_dec"),
            "o_orderpriority",
        )
        write_table(df, CAT_ORDERS_TYPED, root=root, num_regions=4, mode="overwrite", timestamp=1000)
    t = read_table(spark, CAT_ORDERS_TYPED, root=root)
    # The table stores DECIMAL(12,2) (roundtrip pinned by test_coders),
    # but the GATE emits round(double, 2): decimal wire representations
    # (trailing zeros, rendering) differ between engines and flip the
    # driver's hash without any canonical value differing — the module
    # convention ("round post-aggregation doubles") extends to decimals.
    return t.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderkey") < 2000)
    ).withColumn("o_price_dec", F.round(F.col("o_price_dec").cast("double"), 2))


# SQL over an shc-backed temp view (SURVEY §3.3): the rowkey predicate
# written in SQL must reach the source through the view — same pushdown
# machinery as the DataFrame path, driven from spark.sql.
@register(
    "shc_sql_over_view",
    """
    SELECT c_custkey, c_name, round(sum(c_acctbal), 2) AS bal
    FROM customer WHERE c_custkey BETWEEN 200 AND 400
    GROUP BY c_custkey, c_name
    """,
)
def shc_sql_over_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_customer(spark, sf_dir)
    view = "shc_customer_view"
    read_table(spark, CAT_CUSTOMER, root=root).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT c_custkey, c_name, round(sum(c_acctbal), 2) AS bal
        FROM {view} WHERE c_custkey BETWEEN 200 AND 400
        GROUP BY c_custkey, c_name
        """
    )


CAT_CUST_WIDE = json.dumps(
    {
        "table": {"namespace": "q", "name": "cust_wide", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "c_name": {"cf": "cfa", "col": "nm", "type": "string"},
            "c_mktsegment": {"cf": "cfa", "col": "sg", "type": "string"},
            "c_acctbal": {"cf": "cfb", "col": "bl", "type": "double"},
        },
    }
)


def _ensure_cust_wide(spark: SparkSession, sf_dir: str) -> str:
    root = _root(sf_dir, "custwide")
    if not os.path.exists(os.path.join(root, "q.cust_wide", "_regions.json")):
        df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet"))
        write_table(
            df.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal"),
            CAT_CUST_WIDE,
            root=root,
            num_regions=8,
            mode="overwrite",
            timestamp=1000,
        )
    return root


# restrictive=FAMILY + cross-catalog dynamic capture
# (DynamicColumnSuite.scala:151-248, HBaseRelation.scala:348-352): the
# table written with the wide static catalog is re-read through a
# catalog that captures family cfa as a qualifier->value map; exploding
# the map reproduces the cells.
@register(
    "shc_restrictive",
    """
    SELECT c_custkey, 'nm' AS qual, c_name AS val FROM customer
    UNION ALL
    SELECT c_custkey, 'sg' AS qual, c_mktsegment AS val FROM customer
    """,
)
def shc_restrictive(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _ensure_cust_wide(spark, sf_dir)
    dyn = json.dumps(
        {
            "table": {"namespace": "q", "name": "cust_wide", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "cfa": {"cf": "cfa", "col": "", "type": "map<string,string>"},
            },
        }
    )
    t = read_table(spark, dyn, root=root, restrictive="family")
    return t.select("c_custkey", F.explode("cfa").alias("qual", "val"))


# map<long, T> version maps on read (keepVersions,
# HBaseTableScan.scala:107-110): the two-generation customer table read
# through a catalog typing c_name as map<long,string>; exploding gives
# one row per stored version.
@register(
    "shc_versions_map",
    """
    SELECT c_custkey, CAST(1000 AS BIGINT) AS ts, c_name AS name FROM customer
    UNION ALL
    SELECT c_custkey, CAST(2000 AS BIGINT) AS ts, concat(c_name, ':v2') AS name
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def shc_versions_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    shc_version_merge(spark, sf_dir)  # ensure both generations exist
    root = _root(sf_dir, "custv")
    vcat = json.dumps(
        {
            "table": {"namespace": "q", "name": "customer", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "name_vers": {"cf": "cf", "col": "name", "type": "map<long,string>"},
            },
        }
    )
    t = read_table(spark, vcat, root=root)
    return t.select("c_custkey", F.explode("name_vers").alias("ts", "name"))


# Dynamic column family (map<string,T> with empty qualifier,
# DynamicColumnSuite.scala:109-123): per-nation map of mktsegment ->
# customer count written through the source, read back, exploded.
@register(
    "shc_dynamic_map",
    """
    SELECT c_nationkey, c_mktsegment AS seg, count(*) AS n
    FROM customer GROUP BY 1, 2
    """,
)
def shc_dynamic_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _root(sf_dir, "segmap")
    if not os.path.exists(os.path.join(root, "q.seg_stats", "_regions.json")):
        cust = read_parquet(spark, os.path.join(sf_dir, "customer.parquet"))
        per = (
            cust.groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("c_nationkey")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("c_mktsegment", "n"))
                ).alias("seg_counts")
            )
        )
        write_table(per, CAT_SEG_MAP, root=root, num_regions=4, mode="overwrite", timestamp=1000)
    t = read_table(spark, CAT_SEG_MAP, root=root)
    return t.select("c_nationkey", F.explode("seg_counts").alias("seg", "n"))


# major compaction: the two-generation customer table rewritten into
# ONE generation (per-cell merge preserved: v2 rows carry nulls for
# untouched columns, and the older values must survive compaction),
# then read back — identical to the merge-read over both generations.
@register(
    "shc_compaction",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN concat(c_name, ':v2') ELSE c_name END AS name_latest,
           c_acctbal
    FROM customer
    """,
)
def shc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from shc_spark.sources import compact_table

    # fresh copy of the version-merge fixture under its own root so the
    # shc_version_merge / time-travel gates keep their generations
    src_root = _root(sf_dir, "custv")
    shc_version_merge(spark, sf_dir)  # ensure the source table exists
    root = _root(sf_dir, "custcmp")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    shutil.copytree(
        os.path.join(src_root, "q.customer"), os.path.join(root, "q.customer")
    )
    compact_table(spark, CAT_CUSTOMER, root=root, num_regions=8)
    gens = {
        e
        for e in os.listdir(os.path.join(root, "q.customer"))
        if e.startswith("gen=")
    }
    assert len(gens) == 1, gens
    t = read_table(spark, CAT_CUSTOMER, root=root)
    return t.select("c_custkey", F.col("c_name").alias("name_latest"), "c_acctbal")


# secondary index (Phoenix pattern): derived (value, key) shc table,
# equality pushed to the index's first rowkey dim, bulk_get of the
# candidate keys on the base table, predicate recheck.
@register(
    "shc_secondary_index",
    """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def shc_secondary_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from shc_spark.sources import SecondaryIndex, write_table

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "custix", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "c_mktsegment": {"cf": "cf", "col": "s", "type": "string"},
                "c_acctbal": {"cf": "cf", "col": "b", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "custix")
    shutil.rmtree(root, ignore_errors=True)
    df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    write_table(df, cat, root=root, num_regions=8, mode="overwrite")
    ix = SecondaryIndex(spark, cat, "c_mktsegment", root=root)
    ix.build()
    return ix.lookup("BUILDING").select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal")
    )


# delete tombstones: BUILDING customers deleted from the table; the
# merge read must hide them (oracle: everyone else). Exercises the
# tombstone masking inside the LSM merge-read.
@register(
    "shc_delete",
    """
    SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
)
def shc_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from shc_spark.sources import delete_rows, write_table

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "custdel", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "c_mktsegment": {"cf": "cf", "col": "s", "type": "string"},
                "c_acctbal": {"cf": "cf", "col": "b", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "custdel")
    shutil.rmtree(root, ignore_errors=True)
    df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    write_table(df, cat, root=root, num_regions=8, mode="overwrite", timestamp=1000)
    doomed = df.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    delete_rows(spark, cat, doomed, root=root, timestamp=2000)
    return read_table(spark, cat, root=root).select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal")
    )


# MERGE INTO: one call applies upserts (null = keep older cell) and
# tombstone deletes; the read after the merge must equal the oracle's
# CASE/anti-join reconstruction.
@register(
    "shc_merge_into",
    """
    WITH merged AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000 ELSE c_acctbal END AS bal,
             c_mktsegment
      FROM customer WHERE c_mktsegment <> 'MACHINERY')
    SELECT c_custkey, c_mktsegment, round(bal, 2) AS bal FROM merged
    """,
)
def shc_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from shc_spark.sources import merge_into, write_table

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "custmrg", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "c_mktsegment": {"cf": "cf", "col": "s", "type": "string"},
                "c_acctbal": {"cf": "cf", "col": "b", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "custmrg")
    shutil.rmtree(root, ignore_errors=True)
    df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    write_table(df, cat, root=root, num_regions=8, mode="overwrite", timestamp=1000)
    updates = df.select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_mktsegment"),  # null = keep stored
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 1000).alias("c_acctbal"),
        (F.col("c_mktsegment") == "MACHINERY").alias("__del"),
    ).filter((F.col("c_custkey") % 7 == 0) | F.col("__del"))
    merge_into(spark, cat, updates, root=root, delete_col="__del", timestamp=2000)
    return read_table(spark, cat, root=root).select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    )


# Phoenix-coded composite rowkey through the full write -> scan ->
# pushdown pipeline (reference PhoenixCompositeKeySuite.scala:79-176:
# composite keys with Phoenix PDataType encodings + filter battery).
# Key = (var-length string, sign-flipped bigint): the string dim is
# NUL-terminated inside the key (Phoenix RowKeySchema), the int dim
# exercises the sign-bit flip, and the filters hit both dims plus a
# value column so range translation and Spark re-filtering both run.
@register(
    "shc_phoenix_composite",
    """
    SELECT c_mktsegment, c_custkey, c_name, round(c_acctbal, 2) AS bal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_custkey BETWEEN 100 AND 1200
      AND c_acctbal > 0
    """,
)
def shc_phoenix_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "cust_phx", "tableCoder": "PhoenixType", "version": "2.0"},
            "rowkey": "key1:key2",
            "columns": {
                "c_mktsegment": {"cf": "rowkey", "col": "key1", "type": "string"},
                "c_custkey": {"cf": "rowkey", "col": "key2", "type": "bigint"},
                "c_name": {"cf": "cf", "col": "nm", "type": "string"},
                "c_acctbal": {"cf": "cf", "col": "bal", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "custphx")
    if not os.path.exists(os.path.join(root, "q.cust_phx", "_regions.json")):
        df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
            "c_mktsegment", "c_custkey", "c_name", "c_acctbal"
        )
        write_table(df, cat, root=root, num_regions=6, mode="overwrite", timestamp=1000)
    t = read_table(spark, cat, root=root)
    return t.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_custkey").between(100, 1200)
        & (F.col("c_acctbal") > 0)
    ).select(
        "c_mktsegment", "c_custkey", "c_name", F.round("c_acctbal", 2).alias("bal")
    )


# snapshot diff: two generations of the customer table diffed as
# tables (the batch complement of the CDC feed); the oracle
# reconstructs the change set from the same deterministic mutation.
@register(
    "shc_table_diff",
    """
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'MACHINERY' THEN 'delete'
                ELSE 'update' END AS change
    FROM customer
    WHERE c_mktsegment = 'MACHINERY' OR c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 1000000, 'insert' FROM customer WHERE c_custkey % 100 = 0
    """,
)
def shc_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from shc_spark.sources import diff_tables, write_table

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "custdiff", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "c_mktsegment": {"cf": "cf", "col": "s", "type": "string"},
                "c_acctbal": {"cf": "cf", "col": "b", "type": "double"},
            },
        }
    )
    ra, rb = _root(sf_dir, "custdiff_a"), _root(sf_dir, "custdiff_b")
    for r in (ra, rb):
        shutil.rmtree(r, ignore_errors=True)
    df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    v2 = (
        df.filter(F.col("c_mktsegment") != "MACHINERY")
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 1000).otherwise(
                F.col("c_acctbal")
            ),
        )
        .unionByName(
            df.filter(F.col("c_custkey") % 100 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + 1000000
            )
        )
    )
    write_table(df, cat, root=ra, num_regions=8, mode="overwrite", timestamp=1000)
    write_table(v2, cat, root=rb, num_regions=8, mode="overwrite", timestamp=1000)
    out = diff_tables(spark, cat, ra, rb)
    # customers updated to the same value (bal+1000 on a deleted row
    # never happens; %7 rows keep their key) -> change set is exact
    return out.select("c_custkey", "change")


# co-located rowkey join: two identically-keyed tables joined INSIDE
# the scan (sources/colocated.py — zero Spark shuffles, pinned by
# tests/test_plans.py); the oracle is the plain SQL left join, proving
# the source-level join changes the access path, never the answer.
@register(
    "shc_colocated_join",
    """
    SELECT c.c_custkey, c.c_mktsegment, round(c.c_acctbal, 2) AS bal,
           CAST(o.cnt AS BIGINT) AS cnt, round(o.total, 2) AS total
    FROM customer c
    LEFT JOIN (SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS total
               FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
)
def shc_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources import colocated_join

    cat_b = json.dumps(
        {
            "table": {"namespace": "q", "name": "cust_orders", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "o_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "cnt": {"cf": "cf", "col": "n", "type": "bigint"},
                "total": {"cf": "cf", "col": "t", "type": "double"},
            },
        }
    )
    root_a = _ensure_customer(spark, sf_dir)
    root_b = _root(sf_dir, "custord")
    if not os.path.exists(os.path.join(root_b, "q.cust_orders", "_regions.json")):
        agg = (
            read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("o_totalprice").alias("total"),
            )
        )
        write_table(agg, cat_b, root=root_b, num_regions=8, mode="overwrite", timestamp=1000)
    j = colocated_join(
        spark, CAT_CUSTOMER, cat_b, root=root_a, root_b=root_b, how="left"
    )
    return j.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("bal"),
        "cnt",
        F.round("total", 2).alias("total"),
    )


# REST transport backend (r11 — the Backend B seam, proven): the same
# catalog read THROUGH the HBase REST (Stargate) protocol against the
# in-repo mock server — every cell coder-encoded server-side and
# decoded client-side (the full HBase wire contract the typed-parquet
# embedded backend shortcuts). Oracle: plain SQL over the source
# parquet — transport must never change an answer.
def _rest_url(spark: SparkSession, sf_dir: str) -> str:
    from shc_spark.sources.rest import ensure_rest_server

    root = _ensure_customer(spark, sf_dir)
    return ensure_rest_server(root)


@register(
    "shc_rest_scan",
    "SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS bal, c_mktsegment FROM customer",
)
def shc_rest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources.rest import read_table_rest

    url = _rest_url(spark, sf_dir)
    t = read_table_rest(spark, CAT_CUSTOMER, url)
    return t.select(
        "c_custkey", "c_name", "c_nationkey",
        F.round("c_acctbal", 2).alias("bal"), "c_mktsegment",
    )


# rowkey range pushdown over the wire: the client translates the
# predicate to scanner startRow/stopRow (regions outside never open a
# scanner — pinned by test_rest_partitions_pruned), Spark re-filters
# on top, the answer matches the engine-free SQL.
@register(
    "shc_rest_pushdown",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal FROM customer
    WHERE c_custkey > 100 AND c_custkey <= 400
    """,
)
def shc_rest_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources.rest import read_table_rest

    url = _rest_url(spark, sf_dir)
    t = read_table_rest(spark, CAT_CUSTOMER, url)
    return t.filter((F.col("c_custkey") > 100) & (F.col("c_custkey") <= 400)).select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("bal")
    )


# the AggregationClient call over the wire: the SERVER aggregates per
# region range (the coprocessor-endpoint analog), one JSON of partials
# crosses the network per partition — where the embedded backend's
# scan_aggregate is a wash (SCALE.md), this is the shape that wins.
@register(
    "shc_rest_aggregate",
    """
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT)    AS count_all,
           round(sum(c_acctbal), 2)    AS sum_bal,
           round(avg(c_acctbal), 4)    AS avg_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def shc_rest_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources.rest import scan_aggregate_rest

    url = _rest_url(spark, sf_dir)
    agg = scan_aggregate_rest(
        spark, CAT_CUSTOMER, url, ["c_nationkey"],
        [("count", "*"), ("sum", "c_acctbal"), ("avg", "c_acctbal")],
    )
    return agg.select(
        "c_nationkey",
        "count_all",
        F.round("sum_c_acctbal", 2).alias("sum_bal"),
        F.round("avg_c_acctbal", 4).alias("avg_bal"),
    )


# write path over the wire: Puts batched per task under a tx id, ONE
# generation at the driver-side flush (the manifest is the commit
# point); merged latest-wins view identical through both transports.
# The oracle recomputes the post-append state from the source parquet.
@register(
    "shc_rest_write",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey <= 100 THEN round(c_acctbal + 1000, 2)
                ELSE round(c_acctbal, 2) END AS bal,
           CASE WHEN c_custkey <= 100 THEN 'rest-updated'
                ELSE c_mktsegment END AS seg
    FROM customer
    """,
)
def shc_rest_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources.rest import (
        ensure_rest_server,
        read_table_rest,
        write_table_rest,
    )

    root = _root(sf_dir, "restw")
    marker = os.path.join(root, "q.customer", "_done_rest_write")
    if not os.path.exists(marker):
        df = read_parquet(spark, os.path.join(sf_dir, "customer.parquet"))
        write_table(
            df.select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
            CAT_CUSTOMER, root=root, num_regions=8, mode="overwrite", timestamp=1000,
        )
        url = ensure_rest_server(root)
        upd = (
            df.filter(F.col("c_custkey") <= 100)
            .select(
                "c_custkey", "c_name", "c_nationkey",
                (F.col("c_acctbal") + 1000).alias("c_acctbal"),
                F.lit("rest-updated").alias("c_mktsegment"),
            )
        )
        write_table_rest(upd, CAT_CUSTOMER, url, timestamp=2000)
        open(marker, "w").write("ok")
    url = ensure_rest_server(root)
    t = read_table_rest(spark, CAT_CUSTOMER, url)
    return t.select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )


# r12: composite rowkey + Avro cell BYTE contract over the wire — the
# two serde layers the single-dim REST gates skip (fixed-width bigint
# prefix + var-width string tail, coders/base.py:29; Avro blobs as
# opaque cells). Base written embedded, an update PUT over REST (the
# batch rowkey/cell kernels frame the wire bytes), read back over REST
# with a first-dim range pushed as scanner bounds. Oracle recomputes
# the post-update state from the source parquet.
CAT_PART_CK_AVRO = json.dumps(
    {
        "table": {"namespace": "q", "name": "part_ck_avro", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key1:key2",
        "columns": {
            "p_partkey": {"cf": "rowkey", "col": "key1", "type": "bigint"},
            "p_brand": {"cf": "rowkey", "col": "key2", "type": "string"},
            "p_info": {"cf": "cf", "col": "info", "avro": "schema_pinfo"},
            "p_size": {"cf": "cf", "col": "sz", "type": "int"},
        },
        "schema_pinfo": json.dumps(
            {
                "type": "record",
                "name": "pinfo",
                "fields": [
                    {"name": "p_type", "type": "string"},
                    {"name": "p_retailprice", "type": "double"},
                ],
            }
        ),
    }
)


@register(
    "shc_rest_composite_avro",
    """
    SELECT p_partkey, p_brand,
           CASE WHEN p_partkey <= 50 THEN 'rest-updated' ELSE p_type END AS p_type,
           CASE WHEN p_partkey <= 50 THEN round(p_retailprice + 100, 2)
                ELSE round(p_retailprice, 2) END AS retail,
           p_size
    FROM part WHERE p_partkey <= 500
    """,
)
def shc_rest_composite_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources.rest import (
        ensure_rest_server,
        read_table_rest,
        write_table_rest,
    )

    root = _root(sf_dir, "restcka")
    marker = os.path.join(root, "q.part_ck_avro", "_done_rest_ck_avro")
    if not os.path.exists(marker):
        part = read_parquet(spark, os.path.join(sf_dir, "part.parquet"))
        df = part.select(
            "p_partkey",
            "p_brand",
            F.struct("p_type", "p_retailprice").alias("p_info"),
            F.col("p_size").cast("int").alias("p_size"),
        )
        write_table(df, CAT_PART_CK_AVRO, root=root, num_regions=6, mode="overwrite", timestamp=1000)
        url = ensure_rest_server(root)
        upd = part.filter(F.col("p_partkey") <= 50).select(
            "p_partkey",
            "p_brand",
            F.struct(
                F.lit("rest-updated").alias("p_type"),
                (F.col("p_retailprice") + 100).alias("p_retailprice"),
            ).alias("p_info"),
            F.col("p_size").cast("int").alias("p_size"),
        )
        write_table_rest(upd, CAT_PART_CK_AVRO, url, timestamp=2000)
        open(marker, "w").write("ok")
    url = ensure_rest_server(root)
    t = read_table_rest(spark, CAT_PART_CK_AVRO, url)
    return t.filter(F.col("p_partkey") <= 500).select(
        "p_partkey",
        "p_brand",
        F.col("p_info.p_type").alias("p_type"),
        F.round("p_info.p_retailprice", 2).alias("retail"),
        "p_size",
    )


# r13: S14 THROUGH THE TRANSPORT — the MaxVersionsSuite matrix over
# the wire. The scanner takes HBase's maxVersions (Scan.readVersions /
# Stargate maxVersions): one Stargate Row per key whose Cell list
# carries up to N newest cells PER COLUMN, each with its own
# timestamp; the client reassembles one output row per (key, ts).
# Same fixture and ORACLE as the embedded shc_version_explode gate —
# transport must never change an answer.
@register(
    "shc_rest_version_explode",
    """
    SELECT c_custkey, 1 AS version_rank,
           concat(c_name, ':v2') AS name_v,
           CAST(NULL AS DOUBLE) AS bal_v
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END AS version_rank,
           c_name AS name_v, c_acctbal AS bal_v
    FROM customer
    """,
)
def shc_rest_version_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from shc_spark.sources.rest import ensure_rest_server, read_table_rest_versions

    shc_version_merge(spark, sf_dir)  # ensure both generations exist
    root = _root(sf_dir, "custv")
    url = ensure_rest_server(root)
    t = read_table_rest_versions(spark, CAT_CUSTOMER, url, max_versions=2)
    w = Window.partitionBy("c_custkey").orderBy(F.col("__ts").desc())
    return t.select(
        "c_custkey",
        F.row_number().over(w).alias("version_rank"),
        F.col("c_name").alias("name_v"),
        F.col("c_acctbal").alias("bal_v"),
    )


# r13: S11 THROUGH THE TRANSPORT — bulk point-gets as ONE multiget
# round-trip (HBase multi-Get / Stargate /multiget). Driver-side by
# design: a Get list is a serving primitive bounded by len(keys).
# Missing keys are absent, HBase Get semantics.
@register(
    "shc_rest_multiget",
    """
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
    FROM customer
    WHERE c_custkey IN (3, 77, 250, 414, 655)
    """,
)
def shc_rest_multiget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources.rest import bulk_get_rest

    url = _rest_url(spark, sf_dir)
    # 999999 does not exist: it must simply be absent from the result
    t = bulk_get_rest(spark, CAT_CUSTOMER, url, [3, 77, 250, 414, 655, 999999])
    return t.select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("bal"))


# r13: ATOMIC MUTATIONS over the wire — HBase Increment (batch
# read-add-write committed as ONE generation under the region-server
# lock) and checkAndPut (compare-and-swap on the cell's current
# bytes). The oracle recomputes the deterministic final state from the
# source parquet: increments add (k % 7 + 1) to every k % 3 == 0 key's
# counter; CAS then overwrites every k % 10 == 0 key with 777 (the
# expected value is the true current value, so it applies) and
# ATTEMPTS k % 10 == 5 keys with a wrong expected (must refuse).
CAT_ORDERS_CNT = json.dumps(
    {
        "table": {"namespace": "q", "name": "orders_cnt", "tableCoder": "OrderedType", "version": "2.0"},
        "rowkey": "key",
        "columns": {
            "k": {"cf": "rowkey", "col": "key", "type": "bigint"},
            "cnt": {"cf": "cf", "col": "c", "type": "bigint"},
            "tag": {"cf": "cf", "col": "t", "type": "string"},
        },
    }
)


@register(
    "shc_rest_increment_cas",
    """
    SELECT o_orderkey AS k,
           CASE WHEN o_orderkey % 10 = 0 THEN 777
                WHEN o_orderkey % 3 = 0
                  THEN (o_custkey % 10) + (o_orderkey % 7 + 1)
                ELSE o_custkey % 10 END AS cnt,
           o_orderstatus AS tag
    FROM orders WHERE o_orderkey <= 300
    """,
)
def shc_rest_increment_cas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources.rest import (
        check_and_put_rest,
        ensure_rest_server,
        increment_rest,
        read_table_rest,
    )

    root = _root(sf_dir, "restcnt")
    marker = os.path.join(root, "q.orders_cnt", "_done_rest_cas")
    if not os.path.exists(marker):
        orders = read_parquet(spark, os.path.join(sf_dir, "orders.parquet")).filter(
            F.col("o_orderkey") <= 300
        )
        base = orders.select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_custkey") % 10).cast("long").alias("cnt"),
            F.col("o_orderstatus").alias("tag"),
        )
        write_table(base, CAT_ORDERS_CNT, root=root, num_regions=4, mode="overwrite", timestamp=1000)
        url = ensure_rest_server(root)
        # the key/base pairs are bounded (<= 300 keys) by construction
        rows = {r["k"]: r["cnt"] for r in base.select("k", "cnt").collect()}
        incs = [(k, "cnt", k % 7 + 1) for k in sorted(rows) if k % 3 == 0]
        if incs:
            increment_rest(CAT_ORDERS_CNT, url, incs, ts=2000)
        for k in sorted(rows):
            cur = rows[k] + (k % 7 + 1 if k % 3 == 0 else 0)
            if k % 10 == 0:
                assert check_and_put_rest(
                    CAT_ORDERS_CNT, url, k, "cnt", cur, 777, ts=3000
                )
            elif k % 10 == 5:
                # wrong expected: the CAS must refuse, state unchanged
                assert not check_and_put_rest(
                    CAT_ORDERS_CNT, url, k, "cnt", cur + 1_000_000, 888, ts=3000
                )
        open(marker, "w").write("ok")
    url = ensure_rest_server(root)
    t = read_table_rest(spark, CAT_ORDERS_CNT, url)
    return t.select("k", "cnt", "tag")


# Coprocessor-style aggregation scan (the HBase AggregationClient /
# AggregateImplementation analog, beyond the reference): each region
# partition returns PARTIAL aggregates computed inside the scan (arrow
# kernels, after the LSM merge), so only #partitions x #groups rows
# cross the source boundary; api.scan_aggregate finalizes with a
# kilobyte shuffle. key_ranges additionally prunes regions (the Scan
# start/stopRow the AggregationClient takes). The oracle is the plain
# GROUP BY over the source parquet.
@register(
    "shc_scan_aggregate",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)         AS count_all,
           round(sum(o_totalprice), 2)      AS sum_tp,
           round(min(o_totalprice), 2)      AS min_tp,
           round(max(o_totalprice), 2)      AS max_tp,
           round(avg(o_totalprice), 4)      AS avg_tp
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 600
    GROUP BY o_orderstatus
    """,
)
def shc_scan_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.sources import scan_aggregate

    root = _ensure_orders_ck(spark, sf_dir)
    agg = scan_aggregate(
        spark,
        CAT_ORDERS_CK,
        ["o_orderstatus"],
        [
            ("count", "*"),
            ("sum", "o_totalprice"),
            ("min", "o_totalprice"),
            ("max", "o_totalprice"),
            ("avg", "o_totalprice"),
        ],
        root=root,
        key_ranges=[(100, 600)],
    )
    return agg.select(
        "o_orderstatus",
        "count_all",
        F.round("sum_o_totalprice", 2).alias("sum_tp"),
        F.round("min_o_totalprice", 2).alias("min_tp"),
        F.round("max_o_totalprice", 2).alias("max_tp"),
        F.round("avg_o_totalprice", 4).alias("avg_tp"),
    )


# Phoenix SALT_BUCKETS analog: the write spreads monotonically
# increasing keys via a 1-byte key hash prefix; reads recompute the
# bucket (points) or fan ranges out across buckets. The oracle is the
# plain SQL over the source parquet — salting must never change an
# answer, only the physical layout.
@register(
    "shc_salted_table",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
           o_orderstatus
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 4000 OR o_orderkey IN (7, 42)
    """,
)
def shc_salted_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "orders_salted", "tableCoder": "OrderedType", "version": "2.0", "saltBuckets": 8},
            "rowkey": "key",
            "columns": {
                "o_orderkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "o_custkey": {"cf": "cf", "col": "ck", "type": "bigint"},
                "o_totalprice": {"cf": "cf", "col": "tp", "type": "double"},
                "o_orderstatus": {"cf": "cf", "col": "st", "type": "string"},
            },
        }
    )
    root = _root(sf_dir, "osalt")
    if not os.path.exists(os.path.join(root, "q.orders_salted", "_regions.json")):
        df = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
        write_table(
            df.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
            cat, root=root, num_regions=8, mode="overwrite", timestamp=1000,
        )
    out = read_table(spark, cat, root=root).filter(
        (F.col("o_orderkey").between(1000, 4000)) | (F.col("o_orderkey").isin(7, 42))
    )
    return out.select(
        "o_orderkey", "o_custkey",
        F.round("o_totalprice", 2).alias("price"), "o_orderstatus",
    )


# batch CDC apply: one appended generation carrying upserts AND
# tombstones (the Debezium-feed downstream). The oracle reconstructs
# the post-feed state relationally — updates overlay, deletes drop,
# inserts append.
@register(
    "shc_cdc_apply",
    """
    WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
    updated AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 1000, 2)
                  ELSE round(c_acctbal, 2) END AS bal
      FROM base WHERE c_custkey % 13 <> 0),
    inserted AS (
      SELECT c_custkey + 1000000 AS c_custkey, 'CDC' AS c_mktsegment,
             round(0.0, 2) AS bal
      FROM base WHERE c_custkey % 100 = 0)
    SELECT * FROM updated UNION ALL SELECT * FROM inserted
    """,
)
def shc_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from shc_spark.sources import apply_cdc

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "cust_cdc", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "c_custkey": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "c_mktsegment": {"cf": "cf", "col": "seg", "type": "string"},
                "bal": {"cf": "cf", "col": "bal", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "custcdc")
    shutil.rmtree(root, ignore_errors=True)  # deterministic rebuild
    base = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("bal")
    )
    write_table(base, cat, root=root, num_regions=8, mode="overwrite", timestamp=1000)
    feed = (
        base.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("bal", F.round(F.col("bal") + 1000, 2))
        .withColumn("op", F.lit("U"))
        .unionByName(
            base.filter(F.col("c_custkey") % 13 == 0)
            .withColumn("op", F.lit("D"))
        )
        .unionByName(
            base.filter(F.col("c_custkey") % 100 == 0)
            .withColumn("c_custkey", F.col("c_custkey") + 1000000)
            .withColumn("c_mktsegment", F.lit("CDC"))
            .withColumn("bal", F.round(F.lit(0.0), 2))
            .withColumn("op", F.lit("I"))
        )
    )
    apply_cdc(spark, cat, feed, root=root, timestamp=2000)
    return read_table(spark, cat, root=root).select(
        "c_custkey", "c_mktsegment", F.round("bal", 2).alias("bal")
    )


# Per-family TTL (HBase HColumnDescriptor.setTimeToLive; PARITY.md
# extends S15 time semantics): events land as one row-version each
# with __ts = the event's own time; family "fa" (the value cell)
# expires after 7 days while family "fb" (the user_id cell) never
# does — reading "as of" the newest event must blank exactly the
# value cells older than the horizon and keep every row alive via its
# non-expiring cell. Both sides compute the horizon from the data
# (max ts), so the gate is deterministic per scale factor.
@register(
    "shc_ttl_read",
    """
    SELECT event_id,
           user_id,
           CASE WHEN epoch_ms(ts) >= epoch_ms((SELECT max(ts) FROM events)) - 604800000
                THEN round(value, 2) END AS value
    FROM events
    """,
)
def shc_ttl_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from shc_spark.queries.relational import _events
    from shc_spark.sources import apply_cdc

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "evttl", "tableCoder": "OrderedType", "version": "2.0", "ttl": {"fa": 604800}},
            "rowkey": "key",
            "columns": {
                "event_id": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "value": {"cf": "fa", "col": "v", "type": "double"},
                "user_id": {"cf": "fb", "col": "u", "type": "bigint"},
            },
        }
    )
    root = _root(sf_dir, "evttl")
    ev = _events(spark, sf_dir)
    if not os.path.exists(os.path.join(root, "q.evttl", "_regions.json")):
        shutil.rmtree(root, ignore_errors=True)
        feed = ev.select(
            "event_id", "value", "user_id",
            F.lit("I").alias("op"), F.col("ts").alias("evt"),
        )
        apply_cdc(spark, cat, feed, root=root, ts_col="evt")
    now_ms = ev.select(F.unix_millis(F.max("ts"))).first()[0]
    return read_table(spark, cat, root=root, ttl_now_ms=now_ms).select(
        "event_id", "user_id", F.round("value", 2).alias("value")
    )
