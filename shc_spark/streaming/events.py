"""Structured Streaming over the events stream.

The reference has NO streaming surface (SURVEY.md §2.3: no watermark /
window / stateful code anywhere in core/src/main) — this module is the
M6 extension built entirely on Spark's native streaming engine:

- ``stream_events``: file-source readStream over the events table
  (nanos ts read as long, truncated to micros — same convention as the
  batch path);
- ``run_tumbling_counts``: watermarked tumbling event-time window
  aggregation;
- ``run_sessionization``: native ``session_window`` (gap-close
  semantics) per user;
- ``run_stateful_totals``: custom stateful operator via
  ``applyInPandasWithState`` — running per-user totals kept in
  executor state, the streaming analog of a grouped aggregate;
- ``stream_write_table``: exactly-once-per-batch sink into an shc
  table via foreachBatch -> write_table (each microbatch becomes one
  generation, like an HBase memstore flush).

All helpers drive the query with ``processAllAvailable`` against a
memory sink and return the materialized DataFrame, so batch oracles
can check streaming results.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = "event_id long, ts long, user_id long, event_type string, value double, props string"
EVENTS_SCHEMA_TS = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
)


def _events_ts_is_nanos(sf_dir: str) -> bool:
    """Older testdata generations store ts as TIMESTAMP(NANOS) (arrow
    timestamp[ns]); current ones as TIMESTAMP(MICROS). The streaming source
    needs an explicit schema, so sniff the parquet footer once."""
    import pyarrow.parquet as pq

    t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
    return str(t).startswith("timestamp[ns")


def table_stream_dir(sf_dir: str, name: str) -> str:
    """File streaming sources read directories; expose a single
    <name>.parquet file through a symlinked staging dir (md5-keyed —
    builtin hash() is process-salted and collisions would silently
    serve another sf_dir's data)."""
    import hashlib

    src = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(src):
        raise FileNotFoundError(src)
    key = hashlib.md5(f"{sf_dir}:{name}".encode()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"shc_stream_{key}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    if os.path.islink(link) and os.path.realpath(link) != os.path.realpath(src):
        os.remove(link)  # stale/foreign symlink
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


def _events_stream_dir(sf_dir: str) -> str:
    return table_stream_dir(sf_dir, "events")


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events with event-time ``ts`` (timestamp)."""
    nanos = _events_ts_is_nanos(sf_dir)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA if nanos else EVENTS_SCHEMA_TS)
        .format("parquet")
        .load(_events_stream_dir(sf_dir))
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(result: DataFrame, mode: str) -> DataFrame:
    name = f"mem_{uuid.uuid4().hex[:10]}"
    q = (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    spark = result.sparkSession
    # detach from the memory sink (localCheckpoint materializes the
    # rows) and drop the sink table — otherwise every invocation pins
    # a full result copy in the driver for the session lifetime
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def run_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type with a
    10-minute watermark (late rows beyond it would be dropped)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


def run_sessionization(spark: SparkSession, sf_dir: str, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions: events closer than ``gap`` merge into one
    session (native session_window)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        "total_value",
    )


def run_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: per-user running totals held in
    ``applyInPandasWithState`` state across microbatches. After the
    stream drains, the emitted state equals the batch aggregate — the
    correctness hook for the oracle."""
    ev = stream_events(spark, sf_dir)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [round(total, 2)], "n_events": [n]}
        )

    result = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, total_value double, n_events long",
        stateStructType="total double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(result, "update")
    # update-mode memory sink appends one row per state change; the
    # newest row per user is the final state
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "total_value", "n_events")
    )


def stream_write_table(
    stream_df: DataFrame, catalog: str, root: str, checkpoint: str | None = None
):
    """Streaming sink into an shc table: each microbatch appends one
    generation (timestamped with the batch id), mirroring HBase
    memstore flushes. foreachBatch gives exactly-once per batch on top
    of checkpointing."""
    from shc_spark.sources import write_table

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_table(batch_df, catalog, root=root, timestamp=batch_id)

    writer = stream_df.writeStream.foreachBatch(sink)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: click events joined to the same
    user's purchase events within 30 minutes. Both sides carry
    watermarks and the join has an explicit event-time range bound —
    the two conditions Spark needs to know when buffered state can be
    evicted, which is what makes this run unbounded at 100 TB/day
    instead of accumulating both streams forever."""
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        ((F.unix_micros("p_ts") - F.unix_micros("c_ts")) / 1_000_000).cast("long").alias("gap_s"),
    )
    return _run_to_memory(joined, "append")


def run_stream_stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream join with watermark-driven state
    eviction: every click, joined to the same user's purchases in the
    following 30 minutes — and clicks with NO such purchase still
    emit, with a null match, once the watermark PROVES no match can
    arrive anymore (c_ts + 30 min < right-side watermark). That proof
    is what bounds the state at 100 TB/day: a buffered click is
    dropped (emitting its null row) the moment it is out of reach.

    A finite stream's tail can never get the proof — the watermark
    stops 10 minutes short of max event time, stranding the last ~40
    minutes of clicks in state — so the click side is bounded to
    41 minutes before the smaller of the two sides' max event times,
    computed once from the STATIC table (the batch oracle applies the
    same bound; both are deterministic per scale factor). The GLOBAL
    watermark is the min across both inputs, so bounding against the
    overall max alone would leave only whatever slack the lagging
    side happens to have — if the last purchase trailed the last
    click by over a minute, tail null rows would silently go
    missing."""
    from shc_spark.queries.relational import _events as _batch_events

    ev_static = _batch_events(spark, sf_dir)
    cutoff = ev_static.select(
        F.least(
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
        )
        - F.expr("INTERVAL 41 MINUTES")
    ).first()[0]
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    # the tail bound applies to the OUTPUT, not the input: filtering
    # the click side before withWatermark would derive the click
    # watermark from the filtered max (data-dependently older),
    # dragging the query's global watermark back and stranding MORE
    # state — the opposite of the intent
    joined = (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
            "leftOuter",
        )
        .filter(F.col("c_ts") <= F.lit(cutoff))
        .select(
            "click_id",
            "purchase_id",
            F.col("c_user").alias("user_id"),
            F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000").alias("gap_s"),
        )
    )
    return _run_to_memory(joined, "append")


def run_stream_merge_latest(
    spark: SparkSession, catalog: str, root: str, apply_deletes: bool = False
) -> DataFrame:
    """Streaming merge-to-latest over a tailed shc table: raw version
    rows arrive per generation (read_stream_table) and a stateful
    operator keyed on the rowkey keeps per-CELL latest-non-null values
    — HBase merge semantics maintained incrementally, the streaming
    dual of api.read_table's batch merge. After the stream drains the
    state equals the batch merge exactly (the gate's oracle).

    ``apply_deletes`` closes the CDC loop: tombstones from the
    ``include_deletes`` feed mask every cell with ts <= tombstone ts
    (even cells arriving in LATER batches — the tombstone ts lives in
    state), newer puts resurrect, and fully-masked keys drop from the
    final view — the streaming dual of the batch merge's delete
    semantics.

    State per key: (value, ts) per cell + max tombstone ts + an update
    counter used to pick each key's newest emission out of the
    update-mode sink."""
    from shc_spark.catalog import parse_catalog
    from shc_spark.sources import read_stream_table

    cat = parse_catalog(catalog)
    key_names = [f.col_name for f in cat.rowkey_fields()]
    vfields = [f for f in cat.value_fields()]
    vnames = [f.col_name for f in vfields]
    vtypes = [f.dt.simpleString() for f in vfields]

    state_ddl = ", ".join(
        [f"{n} {t}" for n, t in zip(vnames, vtypes)]
        + [f"__ts_{n} long" for n in vnames]
        + ["__tomb long", "__upd long"]
    )
    out_ddl = ", ".join(
        [f"{f.col_name} {f.dt.simpleString()}" for f in cat.rowkey_fields()]
        + [f"{n} {t}" for n, t in zip(vnames, vtypes)]
        + ["__upd long"]
    )
    nv = len(vnames)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            st = list(state.get)
        else:
            st = [None] * nv + [-1] * nv + [-1, 0]
        TOMB, UPD = 2 * nv, 2 * nv + 1
        for pdf in pdfs:
            pdf = pdf.sort_values("__ts", kind="stable")
            if apply_deletes and "__del" in pdf.columns:
                dmask = pdf["__del"].fillna(0).astype(int) == 1
                if dmask.any():
                    st[TOMB] = max(st[TOMB], int(pdf["__ts"][dmask].max()))
                pdf = pdf[~dmask]
            for j, n in enumerate(vnames):
                col = pdf[n]
                mask = col.notna()
                if apply_deletes:
                    mask = mask & (pdf["__ts"] > st[TOMB])
                if mask.any():
                    # the LAST non-null in ts order is the only batch
                    # candidate that can win against the state
                    pos = mask.to_numpy().nonzero()[0][-1]
                    ts = int(pdf["__ts"].iloc[pos])
                    if ts >= st[nv + j]:
                        st[j] = col.iloc[pos]
                        st[nv + j] = ts
        if apply_deletes:
            # a tombstone (this batch or earlier) masks state cells at
            # or below its ts
            for j in range(nv):
                if st[nv + j] != -1 and st[nv + j] <= st[TOMB]:
                    st[j] = None
                    st[nv + j] = -1
        st[UPD] += 1
        state.update(tuple(st))
        yield pd.DataFrame(
            [dict(zip(key_names, key)) | dict(zip(vnames, st[:nv])) | {"__upd": st[UPD]}]
        )

    stream = read_stream_table(
        spark, catalog, root=root, keep_internal=True, include_deletes=apply_deletes
    )
    result = stream.groupBy(*key_names).applyInPandasWithState(
        update,
        outputStructType=out_ddl,
        stateStructType=state_ddl,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(result, "update")
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_names).orderBy(F.desc("__upd"))
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*key_names, *vnames)
    )
    if apply_deletes:
        # a fully-masked key's last emission is all-null: not a row
        from functools import reduce

        final = final.filter(
            reduce(lambda a, b: a | b, [F.col(n).isNotNull() for n in vnames])
        )
    return (
        final
    )


def run_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes — each event contributes
    to 4 overlapping windows (epoch-aligned, like F.window)."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


def run_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: first event per (user_id, event_type)
    key via ``dropDuplicatesWithinWatermark`` — the operator a
    streaming ingest pipeline uses to drop at-least-once re-deliveries
    without unbounded state (keys older than the watermark delay are
    evicted; a re-delivery within the delay is suppressed exactly).

    The delay here spans the whole fixture so no key is ever evicted
    mid-stream and the emitted key set equals batch DISTINCT — which is
    what the oracle checks. Only the key columns are projected: WHICH
    row wins per key depends on arrival order, the key set does not.
    At scale: state is one entry per in-window key, partitioned by key
    hash across executors; no shuffle beyond the state exchange."""
    ev = stream_events(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "365 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(deduped, "append")


def run_stream_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-operator composition under Structured Streaming: the
    documents table arrives as a file stream, quality_features (a pure
    codegen'd projection — stateless, so it applies per micro-batch
    unchanged) feeds a stateful complete-mode aggregation per source.
    Converges to the batch answer once the stream drains."""
    from pyspark.sql import functions as F

    from shc_spark.operators import text

    d = table_stream_dir(sf_dir, "documents")
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    src = spark.readStream.schema(schema).parquet(d).select("doc_id", "source", "text")
    q = text.quality_features(src, "text")
    agg = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("q_score"), 4).alias("avg_score"),
        F.round(F.avg("q_tokens"), 4).alias("avg_tokens"),
    )
    return _run_to_memory(agg, "complete")


def _staged_table_slices(
    spark: SparkSession, sf_dir: str, table: str, id_col: str, n_slices: int = 4
) -> str:
    """Stage a testdata table as n_slices single-file parquets in
    id-range order with strictly increasing mtimes, so the file stream
    source (which orders by timestamp) delivers ascending-id
    micro-batches deterministically."""
    import hashlib

    from pyspark.sql import functions as F

    key = hashlib.md5(f"{sf_dir}:{table}slices{n_slices}".encode()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"shc_stream_{key}")
    done = os.path.join(d, "_STAGED")
    if os.path.exists(done):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rows = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    lo, hi = rows.agg(F.min(id_col), F.max(id_col)).collect()[0]
    step = (hi - lo + n_slices) // n_slices
    t0 = 1_700_000_000
    for i in range(n_slices):
        part = rows.filter(
            (F.col(id_col) >= lo + i * step) & (F.col(id_col) < lo + (i + 1) * step)
        )
        tmp = os.path.join(d, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"slice-{i:03d}.parquet")
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (t0 + i, t0 + i))
    open(done, "w").close()
    return d


def _staged_doc_slices(spark: SparkSession, sf_dir: str, n_slices: int = 4) -> str:
    return _staged_table_slices(spark, sf_dir, "documents", "doc_id", n_slices)


def run_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup of an ARRIVING document stream: each
    micro-batch is LSH-checked (exact-verified) against every document
    seen in earlier batches AND against smaller-id documents within
    its own batch; a document with any smaller-id near-dup is dropped
    on arrival. Because batches arrive in ascending-id order, the
    retained set equals the batch rule "keep doc iff it has no
    smaller-id near-dup" — which is exactly SQL-expressible, so the
    whole streaming pipeline has a value-exact oracle.

    Scale shape: the seen-store accumulates per-batch (at 100 TB it
    would hold the banded FEATURES in an shc table with a (band,
    bucket) secondary index instead of re-deriving them — re-derivation
    here keeps the gate self-contained); each batch does one bipartite
    band join + one within-batch LSH pass; kept ids append to a result
    table, nothing corpus-sized touches the driver."""
    from pyspark.sql import functions as F

    from shc_spark.operators import dedup

    stream_dir = _staged_doc_slices(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="shc_incdedup_")
    seen_dir = os.path.join(work, "seen")
    kept_dir = os.path.join(work, "kept")
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema

    def step(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select("doc_id", "text").localCheckpoint(eager=True)
        drops = dedup.minhash_lsh_pairs(
            batch, "text", "doc_id", num_perm=64, bands=32, threshold=0.8
        ).select(F.col("id_b").alias("doc_id"))
        if os.path.exists(seen_dir):
            seen = spark.read.parquet(seen_dir)
            cross = dedup.minhash_lsh_pairs_between(
                batch, seen, "text", "doc_id", num_perm=64, bands=32, threshold=0.8
            ).select(F.col("id_a").alias("doc_id"))
            drops = drops.union(cross)
        kept = batch.join(drops.distinct(), "doc_id", "left_anti").select("doc_id")
        kept.write.mode("append").parquet(kept_dir)
        batch.write.mode("append").parquet(seen_dir)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        .select("doc_id", "text")
    )
    q = src.writeStream.foreachBatch(step).start()
    q.processAllAvailable()
    q.stop()
    out = spark.read.parquet(kept_dir).localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


def run_stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous eval-set decontamination: the training corpus
    arrives as a file stream while the benchmark set is STATIC — its
    distinct shingle hashes broadcast into every micro-batch (a
    stream-static left-semi join, stateless), and the only streaming
    state is the dropDuplicates on the (rare) contaminated ids. The
    drained result equals batch text.decontaminate — same operator
    code runs on both, Structured Streaming's unified-API promise."""
    from pyspark.sql import functions as F

    from shc_spark.operators import text

    d = table_stream_dir(sf_dir, "documents")
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    bench_sources = ("src0", "src1")
    static_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    benchmark = static_docs.filter(F.col("source").isin(*bench_sources))
    stream = (
        spark.readStream.schema(schema)
        .parquet(d)
        .filter(~F.col("source").isin(*bench_sources))
        .select("doc_id", "text")
    )
    hits = text.decontaminate(stream, benchmark, "text", "doc_id", n=5)
    return _run_to_memory(hits.select(F.col("id").alias("doc_id")), "append")


def run_stream_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous data-quality monitoring: the documents table arrives
    as a file stream and the SAME dq metric expressions the batch
    validator compiles (operators/dq.py — completeness, bounds, regex
    conformance; uniqueness is excluded because streaming aggregations
    cannot hold exact distinct state) run inside a stateful per-source
    complete-mode aggregation. Converges to the batch answer once the
    stream drains — the oracle is that batch SQL."""
    from pyspark.sql import functions as F

    from shc_spark.operators import dq

    d = table_stream_dir(sf_dir, "documents")
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    src = spark.readStream.schema(schema).parquet(d).select(
        "source", "text", "n_chars", "lang"
    )
    agg = src.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dq.completeness("text").metric().alias("text_complete"),
        dq.bounds("n_chars", 1, 100_000).metric().alias("chars_in_bounds"),
        dq.matches("lang", "^[a-z]{2}$").metric().alias("lang_wellformed"),
    )
    return _run_to_memory(agg, "complete")


def run_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich every streamed event with its
    event_type's corpus-wide statistics computed batch-side. Spark
    broadcast-joins the tiny static aggregate into every micro-batch —
    the standard dimension-enrichment topology (stream side never
    buffers state, no watermark needed for a stream-static inner
    join)."""
    stats = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("type_avg"),
            F.count(F.lit(1)).alias("type_n"),
        )
    )
    ev = stream_events(spark, sf_dir)
    joined = ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "type_avg",
        "type_n",
        (F.col("value") > F.col("type_avg")).alias("above_avg"),
    )
    return _run_to_memory(joined, "append")


def run_stream_topk(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Custom stateful operator: running per-key TOP-K on a stream
    (``applyInPandasWithState`` holding the current k best (value, id)
    pairs — bounded state per key regardless of stream length; the
    heap-maintenance shape every streaming leaderboard uses). After
    the stream drains, the emitted state must equal the batch window
    top-k exactly (ties broken by event_id ascending)."""
    ev = stream_events(spark, sf_dir)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        vals, ids = (state.get if state.exists else ([], []))
        best = list(zip(vals, ids))
        for pdf in pdfs:
            best.extend(zip(pdf["value"].astype(float), pdf["event_id"].astype(int)))
            # keep only k: sort by (-value, id) — deterministic ties
            best.sort(key=lambda t: (-t[0], t[1]))
            best = best[:k]
        state.update(([v for v, _ in best], [i for _, i in best]))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(best),
                "event_id": [i for _, i in best],
                "value": [v for v, _ in best],  # exact: rounding here
                # could alias two different floats and break the
                # final-snapshot selection's tie-break
                "rank": list(range(1, len(best) + 1)),
                "n_seen": [len(best)] * len(best),
            }
        )

    result = ev.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType="event_type string, event_id long, value double, rank int, n_seen int",
        stateStructType="vals array<double>, ids array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(result, "update")
    # update mode emits one snapshot per state change; the FINAL
    # snapshot per key is the last micro-batch's emission. Identify it
    # by re-ranking per (event_type, rank): the final snapshot's rank-r
    # row is the globally best rank-r candidate ever emitted (top-k
    # state is monotone — once a pair enters rank r it can only be
    # displaced by a better one, which the final snapshot contains).
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type", "rank").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", F.round("value", 2).alias("value"), "rank")
    )


def run_stream_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous ingestion into the persisted MinHash-LSH dedup
    index: the corpus arrives as a file stream and every micro-batch
    APPENDS its (even-id) documents to the serving index — build on
    the first batch, append generations after, exactly the streaming
    write path of the build-once-query-many serving shape (the
    reference has no streaming surface at all — this extends its
    batch-only connector the way ``stream_write_table`` extends the
    table sink; here the sink is the LSM-style index itself, so the
    stream output is immediately queryable). After the stream drains,
    a fixed increment (odd ids)
    queries the index through the partition-pruned path; the result
    must equal the batch exact-Jaccard oracle — batch/stream
    ingestion parity, not just row delivery.

    Scale shape: per micro-batch work is one feature pass over the
    BATCH (corpus never re-signed), one bucket-partitioned append
    write; index queries prune to the increment's bucket dirs. State
    lives entirely in the index files — the streaming query itself is
    stateless, so a 100 TB corpus can ingest through arbitrarily many
    batches without executor state growth."""
    from shc_spark.operators import dedup

    stream_dir = _staged_doc_slices(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    work = tempfile.mkdtemp(prefix="shc_stream_didx_")
    path = os.path.join(work, "index")

    def step(batch: DataFrame, batch_id: int) -> None:
        corpus = (
            batch.filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", "text")
            .localCheckpoint(eager=True)  # detach from the stream plan
        )
        if not corpus.count():
            return
        if os.path.exists(os.path.join(path, "meta", "_SUCCESS")):
            # r15: async fold — a micro-batch that trips the fold
            # threshold returns at the sidecar wall; the O(num_buckets)
            # fold overlaps the NEXT batch's feature pass instead of
            # stalling the stream (wait_for_fold below is the batch
            # boundary before serving)
            dedup.append_to_dedup_index(corpus, path, async_fold=True)
        else:
            dedup.build_dedup_index(corpus, path, num_perm=64, bands=32, n=3)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = src.writeStream.foreachBatch(step).start()
    q.processAllAvailable()
    q.stop()
    dedup.wait_for_fold(path)  # drain the last in-flight fold
    inc = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).filter(
        F.col("doc_id") % 2 == 1
    )
    out = dedup.dedup_index_pairs(spark, path, inc, threshold=0.8).localCheckpoint(
        eager=True
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


def run_stream_ivf_ingest(spark: SparkSession, sf_dir: str):
    """Continuous ingestion into the persisted IVF index: embeddings
    arrive as a file stream; the FIRST micro-batch trains the coarse
    quantizer and builds the index, every later batch appends under
    the SAVED centroids (the no-retrain contract — retraining would
    re-shuffle existing postings). After the drain, the index search
    must row-for-row equal the inline ivf_topk over the same corpus
    pinned to the saved codebook — ingestion parity, the streaming
    twin of sim_topk_ivf_append. Returns (index_topk, inline_topk)
    materialized; the caller builds the identity verdict.

    Scale shape: per-batch work is one assign pass over the BATCH plus
    an append write of only the touched cid partitions; the streaming
    query itself is stateless (state lives in the index files)."""
    from shc_spark.operators import similarity

    stream_dir = _staged_table_slices(spark, sf_dir, "embeddings", "vec_id")
    schema = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).schema
    work = tempfile.mkdtemp(prefix="shc_stream_ivf_")
    path = os.path.join(work, "index")

    def step(batch: DataFrame, batch_id: int) -> None:
        rows = (
            batch.filter(F.col("vec_id") % 2 == 0)
            .select("vec_id", "embedding")
            .localCheckpoint(eager=True)  # detach from the stream plan
        )
        if not rows.count():
            return
        if os.path.exists(os.path.join(path, "centroids", "_SUCCESS")):
            similarity.append_to_ivf_index(rows, path, "embedding", "vec_id")
        else:
            similarity.build_ivf_index(rows, path, "embedding", "vec_id", dim=64)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = src.writeStream.foreachBatch(step).start()
    q.processAllAvailable()
    q.stop()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 8)
    cent = similarity.read_ivf_centroids(spark, path)
    idx = similarity.ivf_index_topk(spark, path, queries, k=5, nprobe=4).localCheckpoint(
        eager=True
    )
    direct = similarity.ivf_topk(
        queries, emb.filter(F.col("vec_id") % 2 == 0),
        "embedding", "vec_id", k=5, dim=64, centroids=cent, nprobe=4,
    ).localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return idx, direct


def run_stream_text_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous ingestion into the persisted BM25 inverted index:
    document micro-batches append their posting/length generations and
    stats rows (build on the first batch); the drained index answers a
    fixed query identically to the inline bm25_search over everything
    ingested — the third serving index's streaming twin. Stateless on
    the streaming side; per-batch work is one tokenize pass over the
    BATCH plus bucket-partitioned appends."""
    from shc_spark.operators import textindex

    stream_dir = _staged_doc_slices(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    work = tempfile.mkdtemp(prefix="shc_stream_tidx_")
    path = os.path.join(work, "index")

    def step(batch: DataFrame, batch_id: int) -> None:
        rows = batch.select("doc_id", "text").localCheckpoint(eager=True)
        if not rows.count():
            return
        if os.path.exists(os.path.join(path, "meta", "_SUCCESS")):
            textindex.append_to_text_index(rows, path)
        else:
            textindex.build_text_index(rows, path)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = src.writeStream.foreachBatch(step).start()
    q.processAllAvailable()
    q.stop()
    out = textindex.text_index_topk(
        spark, path, ["join", "scan", "vector"], k=20
    ).localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


def run_streaming_embed_drift(
    spark: SparkSession, sf_dir: str, k: int = 8, laplace: float = 0.5
) -> DataFrame:
    """Streaming embedding drift — ``cluster.embedding_drift``'s PSI
    check as a Structured Streaming monitor: arriving vectors are
    assigned to FIXED shared centroids by the same oracle-exact
    chunked-argmin kernel (a STATELESS map — no per-vector state),
    occupancy is counted per 1-hour event-time tumbling window (the
    only streaming state: open windows x k counters — bounded by the
    time span, corpus size never enters state), and each drained
    window's histogram is scored against the full-corpus reference
    occupancy with the same Laplace-smoothed PSI arithmetic
    ((n+a)/(N+a*k), contributions rounded to 6dp). The curation
    monitor this enables at 100 TB: a crawl pipeline watches
    psi_contrib spikes per ARRIVING window instead of re-scanning the
    corpus; everything corpus-sized stays map-only.

    Event time is synthesized deterministically (ts = vec_id minutes
    since epoch — the embeddings table carries no timestamp) so the
    file stream, the watermark, and the DuckDB oracle agree exactly.
    Output: one row per (present window, cluster) over the full
    cluster grid — (window_start, cluster, ref_n, cur_n, ref_frac,
    cur_frac, psi_contrib)."""
    import numpy as np
    import pandas as pd

    from shc_spark.operators import cluster as _cluster

    batch = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cents = _cluster.seed_centroids(batch, "embedding", "vec_id", k)

    @F.pandas_udf("long")
    def _assign(col: pd.Series) -> pd.Series:
        if col.empty:
            return pd.Series([], dtype="int64")
        c, _ = _cluster._round6_chunked_argmin(
            np.stack(col.to_numpy()).astype(np.float64, copy=False), cents
        )
        return pd.Series(c)

    # reference histogram: the full corpus' occupancy (k rows)
    ref = (
        batch.select(_assign(F.col("embedding")).alias("cluster"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("ref_n"))
    )

    stream_dir = _staged_table_slices(spark, sf_dir, "embeddings", "vec_id")
    src = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    counts = (
        src.withColumn("ts", F.timestamp_seconds(F.col("vec_id") * 60))
        .withColumn("cluster", _assign(F.col("embedding")))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "cluster")
        .agg(F.count(F.lit(1)).alias("cur_n"))
    )
    got = _run_to_memory(counts, "complete").select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "cluster",
        "cur_n",
    )
    # post-drain assembly on the SMALL (windows x k) frame: full
    # cluster grid per present window, window totals, PSI vs ref
    from pyspark.sql import Window as W

    a = float(laplace)
    wins = got.select("window_start").distinct()
    grid = wins.crossJoin(
        F.broadcast(spark.range(k).select(F.col("id").alias("cluster")))
    )
    h = (
        grid.join(got, ["window_start", "cluster"], "left")
        .fillna(0, ["cur_n"])
        .join(F.broadcast(ref), "cluster", "left")
        .fillna(0, ["ref_n"])
    )
    rt = batch.count()
    wt = F.sum("cur_n").over(W.partitionBy("window_start"))
    p = (F.col("ref_n") + a) / (F.lit(float(rt)) + a * k)
    q = (F.col("cur_n") + a) / (wt + a * k)
    return h.select(
        "window_start",
        "cluster",
        "ref_n",
        "cur_n",
        F.round(p, 6).alias("ref_frac"),
        F.round(q, 6).alias("cur_frac"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )
