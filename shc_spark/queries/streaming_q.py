"""Streaming queries for the correctness gate: each runs a REAL
Structured Streaming query (file source -> watermark/window/state ->
memory sink, drained with processAllAvailable) and returns the
materialized result; the DuckDB oracle is the equivalent batch SQL
over events — streaming results must converge to the batch answer once
the stream drains.

events.ts nanos -> micros truncation matches the batch convention;
window starts are epoch-aligned so window('1 hour') == date_trunc('hour').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from shc_spark.streaming import (
    run_sessionization,
    run_stream_dedup,
    run_stateful_totals,
    run_tumbling_counts,
)

QUERIES: dict = {}
ORACLE: dict = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


@register(
    "stream_tumbling_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_tumbling_counts(spark, sf_dir)


@register(
    "stream_sessionization",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM o),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sessionization(spark, sf_dir, gap="30 minutes")


@register(
    "stream_stateful_totals",
    """
    SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stateful_totals(spark, sf_dir)


@register(
    "stream_shc_source",
    """
    SELECT c_custkey, c_name, CAST(1000 AS BIGINT) AS __ts FROM customer
    UNION ALL
    SELECT c_custkey, concat(c_name, ':v2'), CAST(2000 AS BIGINT)
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def stream_shc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SOURCE over an shc table (generation tailing): drain
    the two-generation customer table through readStream; the raw
    version rows must equal both generations' contents."""
    import uuid

    from shc_spark.queries.connector import CAT_CUSTOMER, _root, shc_version_merge
    from shc_spark.sources import read_stream_table

    shc_version_merge(spark, sf_dir)  # ensure both generations exist
    root = _root(sf_dir, "custv")
    stream = read_stream_table(spark, CAT_CUSTOMER, root=root, keep_internal=True)
    name = f"m_{uuid.uuid4().hex[:10]}"
    q = (
        stream.select("c_custkey", "c_name", "__ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


# the same generation tail THROUGH the REST transport (r11, Backend B
# seam): offsets from GET /generations, each entry replayed raw over a
# single-generation scanner — CDC over the wire. Same oracle shape as
# stream_shc_source, on the two-generation customer table.
@register(
    "stream_rest_source",
    """
    SELECT c_custkey, c_name, CAST(1000 AS BIGINT) AS __ts FROM customer
    UNION ALL
    SELECT c_custkey, concat(c_name, ':v2'), CAST(2000 AS BIGINT)
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def stream_rest_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from shc_spark.queries.connector import CAT_CUSTOMER, _root, shc_version_merge
    from shc_spark.sources.rest import ensure_rest_server, read_stream_table_rest

    shc_version_merge(spark, sf_dir)  # ensure both generations exist
    root = _root(sf_dir, "custv")
    url = ensure_rest_server(root)
    stream = read_stream_table_rest(spark, CAT_CUSTOMER, url)
    name = f"m_{uuid.uuid4().hex[:10]}"
    q = (
        stream.select("c_custkey", "c_name", "__ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


@register(
    "stream_merge_latest",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN concat(c_name, ':v2') ELSE c_name END AS c_name,
           c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def stream_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming merge-to-latest must converge to the batch merge: the
    two-generation customer table tailed as a stream through a
    per-cell-latest stateful operator (gen2's null cells don't shadow
    gen1 values)."""
    from shc_spark.queries.connector import CAT_CUSTOMER, _root, shc_version_merge
    from shc_spark.streaming.events import run_stream_merge_latest

    shc_version_merge(spark, sf_dir)  # ensure both generations exist
    root = _root(sf_dir, "custv")
    return run_stream_merge_latest(spark, CAT_CUSTOMER, root)


@register(
    "stream_stream_join",
    """
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
           a.user_id,
           CAST(floor(epoch_us(b.ts) / 1000000 - epoch_us(a.ts) / 1000000) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming.events import run_stream_stream_join

    return run_stream_stream_join(spark, sf_dir)


# LEFT-OUTER stream-stream join: unmatched clicks must ALSO emit (with
# a null purchase) — exactly when the watermark proves no match can
# still arrive. The click side is bounded on BOTH sides to 41 minutes
# before the SMALLER of the two sides' max event times: the global
# watermark is the min across inputs, and a finite stream's watermark
# stops 10 minutes short of max event time, so the tail past that
# bound can never get the proof (see run_stream_stream_join_outer).
@register(
    "stream_join_outer",
    """
    WITH mx AS (SELECT least(
                  max(CASE WHEN event_type = 'click' THEN ts END),
                  max(CASE WHEN event_type = 'purchase' THEN ts END)) AS m
                FROM events),
    c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM events
          WHERE event_type = 'click'
            AND ts <= (SELECT m FROM mx) - INTERVAL 41 MINUTE),
    p AS (SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.click_id, p.purchase_id, c.user_id,
           (epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 1000000 AS gap_s
    FROM c LEFT JOIN p
      ON p.p_user = c.user_id
     AND p.p_ts > c.c_ts AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE
    """,
)
def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming.events import run_stream_stream_join_outer

    return run_stream_stream_join_outer(spark, sf_dir)


@register(
    "stream_sliding_window",
    """
    WITH expanded AS (
      SELECT event_type,
             make_timestamp((CAST(floor(epoch_us(ts) / 900000000) AS BIGINT) - g.i) * 900000000) AS window_start
      FROM events, range(0, 4) g(i))
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n
    FROM expanded GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming.events import run_sliding_counts

    return run_sliding_counts(spark, sf_dir)


# streaming dedup: dropDuplicatesWithinWatermark with a delay spanning
# the fixture — emitted key set converges to batch DISTINCT (which row
# wins per key is arrival-order-dependent, so only keys are projected).
@register(
    "stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_dedup(spark, sf_dir)


# streaming SINK via the Python Data Source API:
# writeStream.format("shc") drains events into a fresh shc table
# (exactly-once manifest commit per micro-batch), read back through the
# batch source — the roundtrip must equal the batch projection.
@register(
    "stream_shc_sink",
    """
    SELECT event_id, user_id, round(value, 2) AS value FROM events
    """,
)
def stream_shc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import shutil

    from pyspark.sql import functions as F

    from shc_spark.queries.connector import _root
    from shc_spark.sources import read_table, write_stream_table
    from shc_spark.streaming import stream_events

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "evsink", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "event_id": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "user_id": {"cf": "cf", "col": "u", "type": "bigint"},
                "value": {"cf": "cf", "col": "v", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "evsink")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(f"{root}_ckpt", ignore_errors=True)
    ev = stream_events(spark, sf_dir).select("event_id", "user_id", "value")
    q = write_stream_table(ev, cat, root=root, checkpoint=f"{root}_ckpt")
    q.processAllAvailable()
    q.stop()
    return read_table(spark, cat, root=root).select(
        "event_id", "user_id", F.round("value", 2).alias("value")
    )


# incremental rollup (continuous aggregation): two generations are
# appended to an shc table; refresh() tails them through the streaming
# source into per-batch partials; read() final-merges. Result must
# equal the batch GROUP BY over all events.
@register(
    "shc_rollup",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value,
           round(avg(value), 4) AS avg_value,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value
    FROM events GROUP BY 1
    """,
)
def shc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import shutil

    from pyspark.sql import functions as F

    from shc_spark.queries.connector import _root
    from shc_spark.queries.relational import _events
    from shc_spark.sources import write_table
    from shc_spark.streaming import IncrementalRollup

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "evroll", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "event_id": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "event_type": {"cf": "cf", "col": "t", "type": "string"},
                "value": {"cf": "cf", "col": "v", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "evroll")
    shutil.rmtree(root, ignore_errors=True)
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    write_table(ev.filter(F.col("event_id") % 2 == 0), cat, root=root, num_regions=4)
    write_table(ev.filter(F.col("event_id") % 2 == 1), cat, root=root, mode="append")
    roll = IncrementalRollup(
        spark,
        cat,
        root,
        group_cols=["event_type"],
        aggs={
            "n": ("count", None),
            "total_value": ("sum", "value"),
            "avg_value": ("avg", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )
    roll.refresh()
    return roll.read().select(
        "event_type",
        "n",
        F.round("total_value", 2).alias("total_value"),
        F.round("avg_value", 4).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    )


# pipeline operators composed under Structured Streaming: the
# documents stream flows through quality_features (stateless codegen
# projection, applied per micro-batch) into a stateful complete-mode
# per-source aggregation; the oracle is the equivalent batch SQL.
@register(
    "stream_quality_by_source",
    """
    WITH f AS (
      SELECT source,
             length(text) AS q_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS q_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             len(list_filter(string_split(text, ' '), w -> w IN (
               'the','and','with','from','der','und','nicht','das',
               'le','et','les','des','el','los','por','una',
               'de5','shi4','zai4','he2'))) AS n_stop
      FROM documents),
    s AS (
      SELECT source, q_tokens,
             least(q_tokens / 64.0, 1.0) * 0.4
             + least((n_stop * 1.0 / greatest(q_tokens, 1)) * 4, 1.0) * 0.4
             + (1 - least((n_punct * 1.0 / greatest(q_chars, 1)) * 10, 1.0)) * 0.2
               AS q_score
      FROM f)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(q_score), 4) AS avg_score,
           round(avg(q_tokens), 4) AS avg_tokens
    FROM s GROUP BY source
    """,
)
def stream_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming import run_stream_quality_by_source

    return run_stream_quality_by_source(spark, sf_dir)


# incremental streaming dedup: ascending-id micro-batches are near-dup
# checked against all earlier arrivals, so the retained set equals the
# batch rule "keep iff no smaller-id near-dup" — the oracle computes
# exactly that from the exact-Jaccard pair set.
@register(
    "stream_incremental_dedup",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM t),
    sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM pos),
    ds AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    jac AS (SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS j
            FROM inter JOIN sizes sa ON id_a = sa.doc_id
                       JOIN sizes sb ON id_b = sb.doc_id)
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM jac WHERE round(j, 4) >= 0.8)
    """,
)
def stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming import run_stream_incremental_dedup

    return run_stream_incremental_dedup(spark, sf_dir)


# continuous decontamination: the corpus stream is semi-joined per
# micro-batch against the STATIC benchmark's broadcast shingle set
# (stateless); dropDuplicates on the contaminated ids is the only
# state. Drained result == the batch decontaminate oracle.
@register(
    "stream_decontaminate",
    """
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
    g AS (SELECT doc_id, source, array_to_string(ws[s.i:s.i+4], ' ') AS gram
          FROM t CROSS JOIN LATERAL
            (SELECT unnest(generate_series(1, len(t.ws) - 4)) AS i) s),
    bench AS (SELECT DISTINCT gram FROM g WHERE source IN ('src0', 'src1'))
    SELECT DISTINCT doc_id FROM g
    WHERE source NOT IN ('src0', 'src1') AND gram IN (SELECT gram FROM bench)
    """,
)
def stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming import run_stream_decontaminate

    return run_stream_decontaminate(spark, sf_dir)


# continuous dq monitoring: the batch validator's metric expressions
# run inside a stateful per-source streaming aggregation; once the
# stream drains the report equals the batch computation.
@register(
    "stream_dq_monitor",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(count(text) * 1.0 / count(*), 6) AS text_complete,
           round(avg(CASE WHEN n_chars IS NULL THEN NULL
                          WHEN n_chars BETWEEN 1 AND 100000 THEN 1.0 ELSE 0.0 END), 6)
             AS chars_in_bounds,
           round(avg(CASE WHEN lang IS NULL THEN NULL
                          WHEN regexp_matches(lang, '^[a-z]{2}$') THEN 1.0 ELSE 0.0 END), 6)
             AS lang_wellformed
    FROM documents GROUP BY source
    """,
)
def stream_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming import run_stream_dq_monitor

    return run_stream_dq_monitor(spark, sf_dir)


# stream-static broadcast enrichment: the dimension-join topology —
# static per-type stats broadcast into every micro-batch, no stream
# state, no watermark. The oracle is the equivalent batch join.
@register(
    "stream_static_join",
    """
    WITH s AS (SELECT event_type, round(avg(value), 4) AS type_avg,
                      count(*) AS type_n
               FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
           s.type_avg, s.type_n, e.value > s.type_avg AS above_avg
    FROM events e JOIN s USING (event_type)
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming.events import run_stream_static_enrich

    return run_stream_static_enrich(spark, sf_dir)


# custom stateful streaming TOP-K per key (bounded state: the current
# k best pairs per key, whatever the stream length). The drained
# state must equal the batch window top-k exactly.
@register(
    "stream_topk",
    """
    SELECT event_type, event_id, round(value, 2) AS value,
           CAST(rank AS INT) AS rank
    FROM (SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rank
          FROM events)
    WHERE rank <= 5
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming.events import run_stream_topk

    return run_stream_topk(spark, sf_dir, k=5)


# streaming CDC SINK (the twin of the batch apply_cdc and the CDC
# source): a change feed drains through the exactly-once sink as puts
# + tombstones, versioned by per-row event time (event_id here — a
# unique deterministic stamp). The oracle reconstructs the final state
# relationally: the newest put above each key's newest tombstone wins.
@register(
    "stream_cdc_sink",
    """
    WITH f AS (
      SELECT user_id, event_id, value,
             CASE WHEN event_id % 17 = 0 THEN 'D' ELSE 'U' END AS op
      FROM events),
    tomb AS (SELECT user_id, max(event_id) AS dmax FROM f
             WHERE op = 'D' GROUP BY user_id),
    puts AS (SELECT f.user_id, f.event_id, f.value
             FROM f LEFT JOIN tomb USING (user_id)
             WHERE f.op = 'U' AND f.event_id > coalesce(tomb.dmax, -1))
    SELECT user_id, round(max_by(value, event_id), 2) AS value
    FROM puts GROUP BY user_id
    """,
)
def stream_cdc_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import shutil

    from pyspark.sql import functions as F

    from shc_spark.queries.connector import _root
    from shc_spark.sources import read_table, write_stream_cdc
    from shc_spark.streaming import stream_events

    cat = json.dumps(
        {
            "table": {"namespace": "q", "name": "cdcsink", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "key",
            "columns": {
                "user_id": {"cf": "rowkey", "col": "key", "type": "bigint"},
                "value": {"cf": "cf", "col": "v", "type": "double"},
            },
        }
    )
    root = _root(sf_dir, "cdcsink")
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(f"{root}_ckpt", ignore_errors=True)
    feed = stream_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "value",
        F.when(F.col("event_id") % 17 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    q = write_stream_cdc(
        feed, cat, op_col="op", root=root, checkpoint=f"{root}_ckpt", ts_col="event_id"
    )
    q.processAllAvailable()
    q.stop()
    return read_table(spark, cat, root=root).select(
        "user_id", F.round("value", 2).alias("value")
    )


# STREAMING range enrichment: the binned range join's point side is a
# STREAM (clicks), the interval side static — the rewrite composes
# entirely of stateless operators (bin column, stream-static hash
# join on the bin, exact re-filter), so tagging each streamed click
# with the purchase window it falls into needs no state store at all.
# Oracle = the plain batch non-equi join.
@register(
    "stream_range_tag",
    """
    WITH iv AS (SELECT event_id AS interval_id, ts AS s,
                       ts + INTERVAL 2 HOUR AS e
                FROM events
                WHERE event_type = 'purchase' AND event_id % 13 = 0),
         c AS (SELECT event_id AS click_id, ts FROM events
               WHERE event_type = 'click')
    SELECT c.click_id, iv.interval_id
    FROM c JOIN iv ON c.ts >= iv.s AND c.ts <= iv.e
    """,
)
def stream_range_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from shc_spark.operators.ranges import range_join
    from shc_spark.queries.relational import _events
    from shc_spark.streaming.events import _run_to_memory, stream_events

    ev = _events(spark, sf_dir)
    iv = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 13 == 0)
    ).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
    )
    pts = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "ts")
    )
    tagged = range_join(pts, iv, "ts", "s", "e").select("click_id", "interval_id")
    return _run_to_memory(tagged, "append")


# continuous serving-index ingestion: micro-batches append to the
# persisted MinHash-LSH dedup index via foreachBatch (build on the
# first batch), then a fixed increment queries the drained index —
# the result must equal the batch exact-Jaccard oracle, proving
# batch/stream INGESTION parity for the serving shape (not just row
# delivery). Same oracle as dedup_index_query: even ids are the
# streamed corpus, odd ids the increment.
@register(
    "stream_index_ingest",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    pos AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM t),
    sh AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM pos),
    ds AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
      GROUP BY 1, 2),
    jac AS (SELECT id_a, id_b, round(i * 1.0 / (sa.sz + sb.sz - i), 4) AS jaccard
            FROM inter JOIN sizes sa ON id_a = sa.doc_id
                       JOIN sizes sb ON id_b = sb.doc_id)
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.8
    """,
)
def stream_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming.events import run_stream_index_ingest

    return run_stream_index_ingest(spark, sf_dir)


# streaming ANN ingestion: the first embedding micro-batch trains the
# coarse quantizer and builds the persisted IVF index, later batches
# append under the saved centroids; the drained index must search
# row-for-row identically to the inline operator pinned to the same
# codebook (the streaming twin of sim_topk_ivf_append).
@register(
    "stream_ivf_ingest",
    """
    SELECT vec_id AS query_id, TRUE AS full_k, TRUE AS identical
    FROM embeddings WHERE vec_id < 8
    UNION ALL SELECT CAST(-1 AS BIGINT), TRUE, TRUE
    """,
)
def stream_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.queries.pipeline import _identity_verdict
    from shc_spark.streaming.events import run_stream_ivf_ingest

    idx, direct = run_stream_ivf_ingest(spark, sf_dir)
    return _identity_verdict(idx, direct)


# streaming text-retrieval ingestion: micro-batches append posting
# generations to the persisted BM25 index (build on the first batch);
# the drained index answers the fixed query identically to the inline
# bm25_search over the whole corpus — same oracle as text_bm25_search.
@register(
    "stream_text_ingest",
    """
    WITH t AS (SELECT doc_id AS id, string_split(text, ' ') AS ws FROM documents),
    dl AS (SELECT id, len(ws) AS dl FROM t),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tok AS (SELECT id, unnest(ws) AS term FROM t),
    tf AS (SELECT id, term, count(*) AS tf FROM tok
           WHERE term IN ('join', 'scan', 'vector') GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.id,
             sum(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS s
      FROM tf JOIN dfreq USING (term) JOIN dl USING (id), stats
      GROUP BY 1)
    SELECT id, round(s, 4) AS bm25 FROM scored
    ORDER BY round(s, 4) DESC, id LIMIT 20
    """,
)
def stream_text_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from shc_spark.streaming.events import run_stream_text_ingest

    return run_stream_text_ingest(spark, sf_dir)


@register(
    "stream_embed_drift",
    """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.cid,
            round(list_sum(list_transform(list_zip(e.v, c.cv),
                                          p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS dist
          FROM e CROSS JOIN c),
    a AS (SELECT vec_id, cid, dist,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
          FROM d),
    m AS (SELECT vec_id, cid AS cluster FROM a WHERE rn = 1),
    w AS (SELECT cluster,
                 strftime(date_trunc('hour', make_timestamp(vec_id * 60000000)),
                          '%Y-%m-%d %H:%M:%S') AS window_start
          FROM m),
    wins AS (SELECT DISTINCT window_start FROM w),
    grid AS (SELECT wins.window_start, g.cluster
             FROM wins CROSS JOIN
                  (SELECT unnest(generate_series(0, 7)) AS cluster) g),
    cur AS (SELECT window_start, cluster, CAST(count(*) AS BIGINT) AS cur_n
            FROM w GROUP BY 1, 2),
    refh AS (SELECT cluster, CAST(count(*) AS BIGINT) AS ref_n FROM m GROUP BY 1),
    t AS (SELECT CAST(count(*) AS DOUBLE) AS rt FROM m),
    h AS (SELECT grid.window_start, grid.cluster,
                 coalesce(refh.ref_n, 0) AS ref_n,
                 coalesce(cur.cur_n, 0) AS cur_n
          FROM grid LEFT JOIN cur
                 ON grid.window_start = cur.window_start
                AND grid.cluster = cur.cluster
               LEFT JOIN refh ON grid.cluster = refh.cluster),
    wt AS (SELECT window_start, sum(cur_n) AS wn FROM h GROUP BY 1)
    SELECT h.window_start, h.cluster, h.ref_n, h.cur_n,
           round((h.ref_n + 0.5) / (t.rt + 0.5 * 8), 6) AS ref_frac,
           round((h.cur_n + 0.5) / (wt.wn + 0.5 * 8), 6) AS cur_frac,
           round(((h.ref_n + 0.5) / (t.rt + 0.5 * 8)
                  - (h.cur_n + 0.5) / (wt.wn + 0.5 * 8))
                 * ln(((h.ref_n + 0.5) / (t.rt + 0.5 * 8))
                      / ((h.cur_n + 0.5) / (wt.wn + 0.5 * 8))), 6) AS psi_contrib
    FROM h CROSS JOIN t JOIN wt ON h.window_start = wt.window_start
    """,
)
def stream_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r15: streaming embedding drift — the telemetry family's PSI
    monitor as a REAL Structured Streaming query (windowed occupancy
    vs the full-corpus reference; stateless chunked-argmin assign;
    state = open windows x k counters). Oracle replays assignment,
    windowing (ts = vec_id minutes), the cluster grid, window totals
    and the Laplace-smoothed PSI arithmetic verbatim."""
    from shc_spark.streaming import run_streaming_embed_drift

    return run_streaming_embed_drift(spark, sf_dir, k=8)
