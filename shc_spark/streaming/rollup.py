"""Incremental rollup (continuous aggregation) over shc tables.

The "hypertable rollup" shape: a grouped aggregate over a continuously
appended table, maintained WITHOUT rescanning old data. The reference
has no such operator (its README delegates all aggregation to Spark,
which rescans); at 100 TB a daily-refreshed GROUP BY over an
append-only table is the difference between scanning one generation
and scanning the archive.

Design (classic partial-aggregate materialization, expressed with
Spark streaming primitives):

- ``refresh()`` tails the table's append generations through the shc
  STREAMING source (ShcStreamReader offsets = committed region count,
  checkpointed), so each refresh reads ONLY generations committed
  since the last refresh — the incremental property.
- Each micro-batch folds to per-group PARTIAL aggregates (count, sum,
  min, max — avg carries sum+count), written to a partials parquet
  dir partitioned by batch id with dynamic partition overwrite: a
  retried batch REPLACES its own partition, keeping refresh
  exactly-once.
- ``read()`` final-merges the partials: counts/sums add, mins/maxes
  re-min/max, avg = sum/count. The merge input is |groups| x
  |batches| rows — compact-able by rewriting the partials dir, and
  orders of magnitude smaller than the base table.

Decomposable aggregates only, by construction. DISTINCT COUNT is
decomposable via Datasketches HLL (Spark's hll_sketch_agg /
hll_union_agg / hll_sketch_estimate): the partial stores a sketch
binary, the final merge unions sketches — "approx_distinct" in the
agg spec. Exact percentiles remain out of scope (a t-digest partial
would slot in the same way).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FNS = ("count", "sum", "min", "max", "avg", "approx_distinct", "approx_quantile")


class IncrementalRollup:
    """One materialized grouped aggregate over an shc table.

    ``aggs``: mapping output column -> (fn, source_col), fn in
    count/sum/min/max/avg ("count" ignores its source_col).
    """

    def __init__(
        self,
        spark: SparkSession,
        catalog: str,
        root: str,
        group_cols: list,
        aggs: dict,
        state_dir: str | None = None,
    ) -> None:
        for name, spec in aggs.items():
            fn = spec[0]
            if fn not in _FNS:
                raise ValueError(f"{name}: non-decomposable aggregate {fn!r}")
            if fn == "approx_quantile" and (len(spec) < 3 or not 0 <= spec[2] <= 1):
                raise ValueError(f"{name}: approx_quantile needs (fn, col, q in [0,1])")
        self.spark = spark
        self.catalog = catalog
        self.root = root
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)
        from shc_spark.catalog import parse_catalog

        cat = parse_catalog(catalog)
        self.state_dir = state_dir or os.path.join(
            root, f"{cat.namespace}.{cat.name}__rollup"
        )
        self.partials_dir = os.path.join(self.state_dir, "partials")
        self.checkpoint_dir = os.path.join(self.state_dir, "checkpoint")

    # -- partial layer ---------------------------------------------------
    def _partial_exprs(self) -> list:
        out = []
        for name, spec in self.aggs.items():
            fn, col = spec[0], spec[1]
            if fn == "approx_quantile":
                out.append(
                    F.expr(f"kll_sketch_agg_double(CAST(`{col}` AS DOUBLE))").alias(
                        f"{name}__kll"
                    )
                )
            elif fn == "count":
                out.append(F.count(F.lit(1)).alias(f"{name}__cnt"))
            elif fn == "approx_distinct":
                out.append(
                    F.expr(f"hll_sketch_agg(`{col}`)").alias(f"{name}__hll")
                )
            elif fn == "avg":
                out.append(F.sum(col).alias(f"{name}__sum"))
                out.append(F.count(col).alias(f"{name}__cnt"))
            else:
                out.append(getattr(F, fn)(col).alias(f"{name}__{fn}"))
        return out

    def _final_exprs(self) -> list:
        out = []
        for name, spec in self.aggs.items():
            fn = spec[0]
            if fn == "approx_quantile":
                q = spec[2]
                out.append(
                    F.expr(
                        f"kll_sketch_get_quantile_double("
                        f"kll_merge_agg_double(`{name}__kll`), {q!r})"
                    ).alias(name)
                )
            elif fn == "count":
                out.append(F.sum(f"{name}__cnt").alias(name))
            elif fn == "approx_distinct":
                out.append(
                    F.expr(
                        f"hll_sketch_estimate(hll_union_agg(`{name}__hll`))"
                    ).alias(name)
                )
            elif fn == "sum":
                out.append(F.sum(f"{name}__sum").alias(name))
            elif fn == "avg":
                out.append(
                    (F.sum(f"{name}__sum") / F.sum(f"{name}__cnt")).alias(name)
                )
            else:
                out.append(getattr(F, fn)(f"{name}__{fn}").alias(name))
        return out

    def refresh(self) -> None:
        """Fold generations appended since the last refresh into the
        partials. Blocks until the tail is drained."""
        from shc_spark.sources import read_stream_table

        stream = read_stream_table(self.spark, self.catalog, root=self.root)

        def fold(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            partial = (
                batch_df.groupBy(*self.group_cols)
                .agg(*self._partial_exprs())
                .withColumn("__batch", F.lit(batch_id))
            )
            (
                partial.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch")
                .parquet(self.partials_dir)
            )

        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    def read(self) -> DataFrame:
        """Final-merge the partials into the current rollup value."""
        partials = self.spark.read.parquet(self.partials_dir)
        return partials.groupBy(*self.group_cols).agg(*self._final_exprs())

    def _merge_partial_exprs(self) -> list:
        """Partial -> partial merge (keeps the partial representation,
        unlike _final_exprs which produces user-facing values)."""
        out = []
        for name, spec in self.aggs.items():
            fn = spec[0]
            if fn == "approx_quantile":
                out.append(
                    F.expr(f"kll_merge_agg_double(`{name}__kll`)").alias(f"{name}__kll")
                )
            elif fn in ("count",):
                out.append(F.sum(f"{name}__cnt").alias(f"{name}__cnt"))
            elif fn == "sum":
                out.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
            elif fn == "avg":
                out.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
                out.append(F.sum(f"{name}__cnt").alias(f"{name}__cnt"))
            elif fn == "approx_distinct":
                out.append(
                    F.expr(f"hll_union_agg(`{name}__hll`)").alias(f"{name}__hll")
                )
            else:
                out.append(getattr(F, fn)(f"{name}__{fn}").alias(f"{name}__{fn}"))
        return out

    def compact(self) -> None:
        """Fold every per-batch partial into ONE base partition
        (``__batch = -1``) so rollup state stays bounded at |groups|
        rows however many refreshes have run. Partial-to-partial merge:
        counts/sums add, mins/maxes fold, HLL sketches union — the
        estimate is never taken, so a later read() still merges
        losslessly with post-compaction batches."""
        import shutil
        import uuid as _uuid

        partials = self.spark.read.parquet(self.partials_dir)
        base = (
            partials.groupBy(*self.group_cols)
            .agg(*self._merge_partial_exprs())
            .withColumn("__batch", F.lit(-1))
        )
        tmp = f"{self.partials_dir}__compacting_{_uuid.uuid4().hex[:8]}"
        base.write.mode("overwrite").partitionBy("__batch").parquet(tmp)
        old = f"{self.partials_dir}__old_{_uuid.uuid4().hex[:8]}"
        os.rename(self.partials_dir, old)
        os.rename(tmp, self.partials_dir)
        shutil.rmtree(old, ignore_errors=True)
