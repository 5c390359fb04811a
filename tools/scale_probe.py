"""Scaling probe: measure the pipeline operators on synthetically
inflated corpora (N copies of the sf0.1 documents/embeddings with
shifted ids) and record wall times to SCALE.md. The point is the
CURVE, not the absolute numbers: a bucketed/broadcast design should
scale ~linearly in rows; anything super-linear is a red flag the
small-SF bench can't see.

Usage: python tools/scale_probe.py [multipliers...]  (default 1 5 10)
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from shc_spark.io import read_parquet  # noqa: E402


def inflate(spark, name, id_col, mult, salt_col=None):
    """N shifted-id copies of the table. When ``salt_col`` is a text
    column, every token in copy i>0 gets a per-copy suffix: without
    this, the m copies of every document are an m-way EXACT near-dup
    cluster, so the true pair output of the LSH probe is itself
    Theta(m^2) and the wall-clock curve measures output size, not
    algorithmic scaling (measured: x100 identical copies -> 24.75M
    true pairs, 63 s — see SCALE.md note). The suffix must hit EVERY
    token: a sparser salt (one marker word per 5) leaves cross-copy
    Jaccard ~0.33, and at r=2 banding a 0.33-similar pair still
    collides per band with p~j^2=0.11, so ~84% of the Theta(m^2)
    cross-copy pairs return as candidates for verification (measured:
    85 s at x100). Per-token suffixing drives cross-copy Jaccard to
    exactly 0 while preserving within-copy pair structure bijectively
    (shingle (a,b,c) -> (a_i,b_i,c_i)), so corpus size scales m x with
    pair structure ~m*P."""
    from pyspark.sql import functions as F

    if name == "events":
        from shc_spark.queries.relational import _events

        base = _events(spark, SF_DIR)  # adapts nanos/micros ts generations
    else:
        base = read_parquet(spark, f"{SF_DIR}/{name}.parquet")
    n = base.count()
    parts = []
    for i in range(mult):
        p = base.withColumn(id_col, F.col(id_col) + F.lit(i * n))
        if salt_col is not None and i > 0:
            p = p.withColumn(
                salt_col,
                F.regexp_replace(salt_col, r"(\S+)", f"$1~{i}"),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)  # pin: exclude inflation from timings


def connector_probe(spark, mults=(1, 5, 50)) -> list[str]:
    """Connector (shc source/sink) throughput at inflated lineitem
    volumes: bulk write, full merge-read, range-pruned read, and
    LSM merge-read after an append — the four paths a 100 TB table
    lives on. Returns SCALE.md lines."""
    import json
    import shutil

    from pyspark.sql import functions as F

    from shc_spark.sources import read_table, write_table

    cat = json.dumps(
        {
            "table": {"namespace": "probe", "name": "li", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "okey:lnum",
            "columns": {
                "okey": {"cf": "rowkey", "col": "okey", "type": "bigint"},
                "lnum": {"cf": "rowkey", "col": "lnum", "type": "int"},
                "qty": {"cf": "cf", "col": "q", "type": "double"},
                "price": {"cf": "cf", "col": "p", "type": "double"},
                "flag": {"cf": "cf", "col": "f", "type": "string"},
            },
        }
    )
    base = read_parquet(spark, f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("okey"),
        F.col("l_linenumber").cast("int").alias("lnum"),
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )
    kmax = base.agg(F.max("okey")).collect()[0][0] + 1
    cat_b = json.dumps(
        {
            "table": {"namespace": "probe", "name": "li_b", "tableCoder": "OrderedType", "version": "2.0"},
            "rowkey": "okey:lnum",
            "columns": {
                "okey": {"cf": "rowkey", "col": "okey", "type": "bigint"},
                "lnum": {"cf": "rowkey", "col": "lnum", "type": "int"},
                "qty2": {"cf": "cf", "col": "q2", "type": "double"},
            },
        }
    )
    lines = [
        "",
        "## Connector throughput (shc source/sink over inflated lineitem)",
        "",
        "| rows | write (s / Mrows/s) | full merge-read (s / Mrows/s) | 1% range read (s) | LSM merged read after append (s) | co-located join (s / Mrows/s) | CDC apply ~16% feed + merged read (s) |",
        "|---|---|---|---|---|---|---|",
    ]
    for m in mults:
        df = base
        for i in range(1, m):
            df = df.unionByName(base.withColumn("okey", F.col("okey") + F.lit(i * kmax)))
        df = df.localCheckpoint(eager=True)
        n = df.count()
        # synthetic lineitem keys are not unique: merge-to-latest
        # collapses to the distinct-key count
        n_keys = df.select("okey", "lnum").distinct().count()
        root = "/tmp/shc_scale_probe_conn"
        # min-of-2 full cycles: the box drifts through speed phases
        # (see BENCH_FLOOR note) and a single write can straddle one
        t_write = t_full = t_range = t_merge = float("inf")
        lo, hi = int(m * kmax * 0.40), int(m * kmax * 0.41)
        for _ in range(2):
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.time()
            write_table(df, cat, root=root, num_regions=32, mode="overwrite", timestamp=1000)
            t_write = min(t_write, time.time() - t0)
            t0 = time.time()
            assert read_table(spark, cat, root=root).count() == n_keys
            t_full = min(t_full, time.time() - t0)
            t0 = time.time()
            read_table(spark, cat, root=root).filter(
                (F.col("okey") >= lo) & (F.col("okey") < hi)
            ).count()
            t_range = min(t_range, time.time() - t0)
            upd = df.filter(F.col("okey") % 5 == 0).withColumn("qty", F.col("qty") + 1.0)
            write_table(upd, cat, root=root, mode="append", timestamp=2000)
            t0 = time.time()
            assert read_table(spark, cat, root=root).count() == n_keys
            t_merge = min(t_merge, time.time() - t0)
        # co-located source-level join: identically-keyed derived table,
        # join inside the scan (0 exchanges), count the inner result
        from shc_spark.sources import colocated_join

        write_table(
            df.select("okey", "lnum", (F.col("qty") * 2).alias("qty2")),
            cat_b, root=root + "_b", num_regions=32, mode="overwrite", timestamp=1000,
        )
        t_join = float("inf")
        for _ in range(2):
            t0 = time.time()
            assert colocated_join(
                spark, cat, cat_b, root=root, root_b=root + "_b"
            ).count() == n_keys
            t_join = min(t_join, time.time() - t0)
        shutil.rmtree(root + "_b", ignore_errors=True)
        # CDC apply: ~14% upserts + ~2% deletes with per-row event
        # time land as ONE appended generation; the timed read after
        # it pays the 3-generation LSM merge with tombstone masking
        from shc_spark.sources import apply_cdc

        n_del_keys = (
            df.filter(F.col("okey") % 50 == 3).select("okey", "lnum").distinct().count()
        )
        feed = (
            df.filter(F.col("okey") % 7 == 0)
            .withColumn("qty", F.col("qty") + 5.0)
            .withColumn("op", F.lit("U"))
            .unionByName(
                df.filter(F.col("okey") % 50 == 3)
                .select("okey", "lnum")
                .withColumn("qty", F.lit(None).cast("double"))
                .withColumn("price", F.lit(None).cast("double"))
                .withColumn("flag", F.lit(None).cast("string"))
                .withColumn("op", F.lit("D"))
            )
            .withColumn("evt", F.lit(3000))
        ).localCheckpoint(eager=True)
        t0 = time.time()
        apply_cdc(spark, cat, feed, root=root, ts_col="evt")
        assert read_table(spark, cat, root=root).count() == n_keys - n_del_keys
        t_cdc = time.time() - t0
        lines.append(
            f"| {n:,} | {t_write:.2f} / {n / t_write / 1e6:.2f} | "
            f"{t_full:.2f} / {n / t_full / 1e6:.2f} | {t_range:.2f} | {t_merge:.2f} | "
            f"{t_join:.2f} / {n / t_join / 1e6:.2f} | {t_cdc:.2f} |"
        )
        print(("connector", m, n, round(t_write, 2), round(t_full, 2), round(t_range, 2), round(t_merge, 2), round(t_join, 2), round(t_cdc, 2)), flush=True)
        shutil.rmtree(root, ignore_errors=True)
    return lines


def _stage_time_slices(df, ts_col: str, n_slices: int) -> str:
    """Write ``df`` as n_slices time-contiguous single-file parquets
    with increasing mtimes: the file stream source (ordered by mtime)
    then delivers an ascending-event-time tail, so watermarks advance
    and stateful operators actually EVICT — the realistic sustained-
    input shape a state-boundedness probe needs."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    d = tempfile.mkdtemp(prefix="shc_sprobe_")
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).collect()[0]
    lo_s, hi_s = lo.timestamp(), hi.timestamp() + 1.0
    width = (hi_s - lo_s) / n_slices
    bucket = F.floor((F.col(ts_col).cast("double") - F.lit(lo_s)) / F.lit(width))
    t0 = 1_700_000_000
    for i in range(n_slices):
        part = df.filter(bucket == i) if i < n_slices - 1 else df.filter(bucket >= i)
        tmp = os.path.join(d, f"_tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"slice-{i:03d}.parquet")
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (t0 + i, t0 + i))
    return d


def _drain_with_progress(result, mode: str):
    """Run a streaming result to the noop sink, return the engine's own
    per-batch progress dicts (triggerExecution ms, input rows, state
    rows) — measured by Structured Streaming, not by us."""
    import json as _json
    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="shc_sprobe_ckpt_")
    q = (
        result.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    prog = [
        p if isinstance(p, dict) else _json.loads(p.json) for p in q.recentProgress
    ]
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    return [p for p in prog if p.get("numInputRows", 0) > 0]


def _prog_stats(prog) -> tuple:
    """(total rows, total trigger wall s, first-batch wall s,
    last-batch wall s, max state rows) from progress dicts."""
    rows = sum(p["numInputRows"] for p in prog)
    walls = [p["durationMs"]["triggerExecution"] / 1000.0 for p in prog]
    states = [
        so.get("numRowsTotal", 0)
        for p in prog
        for so in (p.get("stateOperators") or [])
    ]
    return rows, round(sum(walls), 2), round(walls[0], 2), round(walls[-1], 2), (
        max(states) if states else 0
    )


def streaming_probe(spark, mults=(1, 10, 100)) -> list[str]:
    """Streaming-subsystem scale rows (VERDICT r12 #3): sustained
    micro-batch input at inflated event volumes, with per-batch walls
    and state sizes read from the engine's OWN progress metrics.

    - stream_rollup: watermarked 1h-tumbling agg (update mode) over an
      8-slice ascending-time tail — throughput + state bound (state =
      open windows x types, NOT corpus size).
    - stream_dedup: dropDuplicatesWithinWatermark((user,type), 2h
      delay) — the eviction path: state rows stay bounded by the
      in-window key set while input grows m x.
    - stream_shc_tail: drain the shc streaming source over base + 3
      append generations (the CDC tail) — rows/s over the source.
    - stream_index_ingest: 4 document micro-batches appended to a
      persisted MinHash-LSH index via foreachBatch — per-increment
      wall must stay flat as generations accumulate.
    """
    import json as _json
    import shutil
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    lines = [
        "",
        "## Streaming (engine-reported per-batch metrics; 8-slice ascending-time tail)",
        "",
        "| probe | x-mult | input rows | total wall (s) | batch walls first->last (s) | max state rows | rows/s |",
        "|---|---|---|---|---|---|---|",
    ]
    for m in mults:
        ev = inflate(spark, "events", "event_id", m)
        d = _stage_time_slices(ev.select("event_id", "ts", "user_id", "event_type", "value"), "ts", 8)
        schema = spark.read.parquet(d).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )

        # 1) watermarked tumbling rollup, update mode (bounded state)
        agg = (
            src.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        )
        prog = _drain_with_progress(agg, "update")
        rows, wall, w0, w1, st = _prog_stats(prog)
        lines.append(
            f"| stream_rollup | x{m} | {rows} | {wall} | {w0} -> {w1} | {st} | {int(rows / max(wall, 0.01))} |"
        )
        print(lines[-1], flush=True)

        # 2) streaming dedup with eviction (bounded state)
        dd = (
            src.withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type")
        )
        prog = _drain_with_progress(dd, "append")
        rows, wall, w0, w1, st = _prog_stats(prog)
        lines.append(
            f"| stream_dedup | x{m} | {rows} | {wall} | {w0} -> {w1} | {st} | {int(rows / max(wall, 0.01))} |"
        )
        print(lines[-1], flush=True)
        shutil.rmtree(d, ignore_errors=True)

        # 3) shc streaming source tail: base + 3 append generations
        from shc_spark.sources import read_stream_table, write_table

        cat = _json.dumps(
            {
                "table": {"namespace": "probe", "name": f"evtail{m}", "tableCoder": "OrderedType", "version": "2.0"},
                "rowkey": "eid",
                "columns": {
                    "eid": {"cf": "rowkey", "col": "eid", "type": "bigint"},
                    "uid": {"cf": "cf", "col": "u", "type": "bigint"},
                    "etype": {"cf": "cf", "col": "t", "type": "string"},
                    "val": {"cf": "cf", "col": "v", "type": "double"},
                },
            }
        )
        root = tempfile.mkdtemp(prefix="shc_sprobe_tail_")
        base = ev.select(
            F.col("event_id").alias("eid"),
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("etype"),
            F.col("value").alias("val"),
        )
        write_table(base, cat, root=root, num_regions=8, mode="overwrite", timestamp=1000)
        upd = base.filter(F.col("eid") % 10 == 0)
        for g in range(3):
            write_table(
                upd.withColumn("val", F.col("val") + g),
                cat, root=root, mode="append", timestamp=2000 + g,
            )
        tail = read_stream_table(spark, cat, root=root)
        prog = _drain_with_progress(tail.select("eid", "val"), "append")
        rows, wall, w0, w1, st = _prog_stats(prog)
        lines.append(
            f"| stream_shc_tail (base+3 gens) | x{m} | {rows} | {wall} | {w0} -> {w1} | {st} | {int(rows / max(wall, 0.01))} |"
        )
        print(lines[-1], flush=True)
        shutil.rmtree(root, ignore_errors=True)
        ev.unpersist()

        # 4) streaming index ingest: 4 doc micro-batches appended to a
        # persisted dedup index; per-increment wall flat vs generation
        # count is the serving contract
        from shc_spark.operators import dedup as _dedup

        docs = inflate(spark, "documents", "doc_id", m, salt_col="text")
        idx = tempfile.mkdtemp(prefix="shc_sprobe_idx_") + "/idx"
        _dedup.build_dedup_index(
            docs.filter(F.col("doc_id") % 2 == 0), idx, num_perm=64, bands=32, n=3
        )
        inc_walls = []
        for s in range(4):
            inc = docs.filter(
                (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 8 == 2 * s + 1)
            ).select("doc_id", "text").localCheckpoint(eager=True)
            t0 = _time.time()
            _dedup.append_to_dedup_index(inc, idx)
            inc_walls.append(round(_time.time() - t0, 2))
        lines.append(
            f"| stream_index_ingest (4 appends) | x{m} | {docs.count() // 2} corpus | {round(sum(inc_walls), 2)} | "
            + " -> ".join(str(w) for w in inc_walls)
            + " | n/a | n/a |"
        )
        print(lines[-1], flush=True)
        # r14: the SMALL-increment steady state (nightly/streaming
        # micro-batches) — these route through the L0 pending sidecar
        # (O(increment) files) with the fold amortizing the bucketed
        # O(num_buckets) churn across appends; the walls should sit
        # far below the corpus-fraction rows above, with one
        # fold-sized spike when the threshold trips
        small_walls = []
        for s in range(4):
            inc = docs.filter(
                (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 1000 == 2 * s + 1)
            ).select("doc_id", "text").localCheckpoint(eager=True)
            t0 = _time.time()
            _dedup.append_to_dedup_index(inc, idx)
            small_walls.append(round(_time.time() - t0, 2))
        lines.append(
            f"| stream_index_ingest_small (4 sidecar appends) | x{m} | ~{max(1, docs.count() // 2000)}-doc increments | {round(sum(small_walls), 2)} | "
            + " -> ".join(str(w) for w in small_walls)
            + " | n/a | n/a |"
        )
        print(lines[-1], flush=True)
        shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
        docs.unpersist()
    return lines


def main() -> None:
    from pyspark.sql import functions as F

    from shc_spark.operators import dedup, similarity, text
    from shc_spark.session import get_spark

    # --only op1,op2: probe just those ops and PRINT their rows without
    # rewriting SCALE.md — a full rewrite from a partial run would drop
    # every other operator's measured columns (this exact accident
    # truncated SCALE.md to an x1-only table once; full rewrites are
    # reserved for full runs).
    argv = sys.argv[1:]
    only: set | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    if "--streaming" in argv:
        # streaming-only mode: print the section for hand-merge into
        # SCALE.md (same contract as --only: partial runs never rewrite
        # the whole file)
        argv.remove("--streaming")
        mults = [int(m) for m in argv] or [1, 10, 100]
        spark = get_spark("scale-probe")
        for ln in streaming_probe(spark, tuple(mults)):
            print(ln)
        return
    mults = [int(m) for m in argv] or [1, 5, 10]
    spark = get_spark("scale-probe")

    def run(df):
        df.write.mode("overwrite").format("noop").save()

    # warm codepaths once
    import pandas as pd
    from pyspark.sql.functions import pandas_udf  # noqa: F401

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 32).select(_w("id")).write.mode("overwrite").format("noop").save()
    spark.range(0, 64, 1, 32).mapInPandas(lambda b: b, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    from shc_spark.operators import cluster, pack, quantize

    OPS = {
        "dedup_exact": lambda d, e: dedup.exact_dedup(d, ["text"], "doc_id"),
        # r9: the pigeonhole fingerprint join shared by text SimHash /
        # image dHash / audio fingerprints — simhash64 feeds it here so
        # the probe covers signature + block join + popcount verify
        "fingerprint_pairs_simhash": lambda d, e: dedup.simhash_near_dups(
            d, "text", "doc_id", max_hamming=3
        ),
        "dedup_minhash_lsh": lambda d, e: dedup.minhash_lsh_pairs(
            d, "text", "doc_id", num_perm=32, bands=16
        ),
        "decontaminate": lambda d, e: text.decontaminate(
            d.filter(F.col("source") != "src0"), d.filter(F.col("source") == "src0")
        ),
        "quality_scores": lambda d, e: text.quality_features(d, "text"),
        "sim_topk_lsh": lambda d, e: similarity.lsh_topk(
            e.filter(F.col("vec_id") < 16), e, k=5, dim=64
        ),
        "dedup_cross_corpus": lambda d, e: dedup.minhash_lsh_pairs_between(
            d.filter(F.col("doc_id") % 2 == 1),
            d.filter(F.col("doc_id") % 2 == 0),
            "text", "doc_id", num_perm=32, bands=16,
        ),
        "text_chunking": lambda d, e: text.chunk_text(d, "text", "doc_id", 120, 30),
        "text_lm_ppl": lambda d, e: text.lm_bigram_scores(d, "text", "doc_id"),
        "pack_sequences": lambda d, e: pack.pack_sequences(
            d.withColumn("n_tok", F.size(F.split(F.col("text"), " "))),
            "n_tok", "doc_id", seq_len=2048,
        ),
        "kmeans_semantic": lambda d, e: cluster.semantic_dedup(
            e, "embedding", "vec_id", k=16, max_iter=2
        ),
        # SemDeDup (r10): cluster count fixed at 64 so per-cluster
        # matmul size grows with the corpus — at deploy scale pick
        # k ~ n/target_cluster_size to keep it bounded
        "dedup_semdedup": lambda d, e: cluster.semdedup(
            e, "embedding", "vec_id", k=64, max_iter=2, threshold=0.45
        ),
        # r13 (VERDICT r12 #1): the AUTO default — k sizes itself from
        # the corpus count (ceil(n/512), clamped), so cluster sizes
        # stay ~constant as the corpus grows and the per-cluster
        # quadratic never concentrates; the fixed-k row above is kept
        # as the contrast (its clusters grow with the corpus)
        "dedup_semdedup_auto": lambda d, e: cluster.semdedup(
            e, "embedding", "vec_id", max_iter=2, threshold=0.45
        ),
        # r14 (VERDICT r13 #3): the one-call LINEAR-total-work variant —
        # md5 shards of ~8192 rows, the whole per-shard pipeline in one
        # task. Per-row assign work is CONSTANT (shard_rows/512
        # centroids) regardless of corpus size, where the AUTO row
        # above pays n/512 centroids per row (the paper's quadratic).
        # shard_rows=8192 (not the 65536 default) so the probe box
        # sees >=25 parallel shard tasks at x100.
        "dedup_semdedup_sharded": lambda d, e: cluster.semdedup_sharded(
            e, "embedding", "vec_id", shard_rows=8192, max_iter=2,
            threshold=0.45,
        ),
        "embed_quantize": lambda d, e: quantize.quantize_embeddings(
            e, "embedding", "vec_id"
        ),
        # r13: cluster-balanced sampling — chunked broadcast-argmin
        # assignment + WindowGroupLimit quotas; seeded centroids (the
        # deploy shape: pre-trained) so the probe isolates the
        # assign+quota machinery
        "embed_balanced_sample": lambda d, e: cluster.balanced_sample(
            e, "embedding", "vec_id", per_cluster=10,
            centroids=cluster.seed_centroids(e, "embedding", "vec_id", 64),
        ),
        # r14: embedding drift (PSI over shared-centroid occupancy) —
        # map-only assignment of BOTH snapshot halves + two k-row
        # histograms; the curve is two corpus scans and nothing else
        "embed_drift": lambda d, e: cluster.embedding_drift(
            e.filter(F.col("vec_id") % 2 == 0),
            e.filter(F.col("vec_id") % 2 == 1),
            cluster.seed_centroids(e, "embedding", "vec_id", 64),
        ),
        # r14: per-vector outlier percentile — map-only assign + one
        # cluster-keyed rank window (cluster-sized partitions)
        "embed_outliers": lambda d, e: cluster.embedding_outliers(
            e, cluster.seed_centroids(e, "embedding", "vec_id", 64)
        ),
        # r15 (VERDICT r14 #5): the combined family — ONE assign pass
        # over the full corpus feeds outliers + profile, plus the ref
        # half-scan for drift; the wall should be ~embed_outliers +
        # half an embed_drift, where the three standalone rows pay
        # three full assign scans between them
        "embed_telemetry_report": lambda d, e: _telemetry_probe(e),
        "text_tfidf": lambda d, e: text.tfidf_terms(d, "text", "doc_id", k=3),
        # DSIR (r10): pure-Catalyst bigram LLR weighting + top-k
        "text_dsir_select": lambda d, e: text.dsir_select(
            d.filter(F.col("source") != "src0"),
            d.filter(F.col("source") == "src0"),
            "text", "doc_id", vocab_size=4096, n=100,
        ),
        "heavy_hitters": lambda d, e: __import__(
            "shc_spark.operators.sketch", fromlist=["sketch"]
        ).heavy_hitters(
            d.select(F.explode(F.split("text", " ")).alias("term")).where(F.col("term") != ""),
            "term",
            min_frac=0.001,
        ),
        "mixture_sample": lambda d, e: text.mixture_sample(
            d, "source", "doc_id",
            {f"src{i}": 50 for i in range(20)}, prefilter=True,
        ),
        # r11: sorted-neighborhood pairing — the wall is the
        # global_rank range shuffle (no single-partition window);
        # pairs output scales linearly with the corpus. r13: the probe
        # uses the RECOMMENDED translate-based key (the r12 row showed
        # ~23s of its 26s was the probe's own regexp_replace key —
        # java regex ~10 MB/s; linkage.normalized_key is the exported
        # fix and what the docs tell callers to use)
        "dedup_snm_pairs": lambda d, e: (lambda lk: lk.snm_pairs(
            d.select("doc_id", lk.normalized_key(F.col("text")).alias("k")),
            F.col("k"), 6, "doc_id",
        ))(__import__("shc_spark.operators.linkage", fromlist=["linkage"])),
        # r11: KMV sketch build + pairwise overlap — distinct shuffle
        # is map-side combined; the k-min is WindowGroupLimit; the
        # pair math is sketch-sized (190 pairs regardless of corpus)
        "kmv_vocab_overlap": lambda d, e: __import__(
            "shc_spark.operators.sketch", fromlist=["sketch"]
        ).kmv_overlap(
            d.select("source", F.explode(F.split("text", " ")).alias("t")).where(
                F.col("t") != ""
            ),
            "source", "t", k=64,
        ),
        "bloom_semi_join": lambda d, e: __import__(
            "shc_spark.operators.bloom", fromlist=["bloom"]
        ).bloom_semi_join(
            d.select("doc_id"),
            d.filter(F.col("doc_id") % 13 == 0).select("doc_id"),
            "doc_id",
        ),
        "length_buckets": lambda d, e: __import__(
            "shc_spark.operators.stats", fromlist=["stats"]
        ).equi_depth_buckets(
            d.select("doc_id", F.length("text").cast("long").alias("n")),
            "n", "doc_id", buckets=8,
        ),
        "weighted_sample": lambda d, e: text.weighted_sample(
            d.select("doc_id", "n_chars"), "n_chars", "doc_id", n=1000
        ),
        # salted copies keep within-copy gram structure bijectively, so
        # the true span set scales ~linearly with corpus size
        "dedup_substring_spans": lambda d, e: dedup.duplicate_spans(
            d, "text", "doc_id", k=3, scope="any"
        ),
        # min_df 2500 = half the x1 corpus: the dictionary stays the
        # (small) head of copy-0's vocabulary at every multiplier,
        # while the df aggregation still scans the full salted corpus
        "remove_boilerplate": lambda d, e: text.remove_frequent_units(
            d, "text", "doc_id", sep=" ", min_df=2500
        ),
        "token_budget_sample": lambda d, e: text.token_budget_sample(
            d, "source", "doc_id", {f"src{i}": 50000 for i in range(20)}
        ),
        # r7: quality-aware representative — pairs + CC + quality join;
        # salted copies keep pair structure per copy, so the CC input
        # scales linearly and the curve measures the composition
        "dedup_keep_best": lambda d, e: dedup.keep_best_per_cluster(
            dedup.connected_components(
                dedup.minhash_lsh_pairs(d, "text", "doc_id", num_perm=32, bands=16)
            ),
            text.quality_features(d.select("doc_id", "text"), "text").select(
                "doc_id", "q_score"
            ),
        ),
        # r7: persisted-index ANN serving — the first call per
        # multiplier builds the index (train + cid-partitioned write),
        # the second only searches; min-of-2 therefore reports the
        # partition-pruned SEARCH wall, which must stay ~flat (nprobe/
        # num_centroids of the index regardless of corpus size)
        "ivf_index_search": lambda d, e: _ivf_index_probe(e),
        # r7: persisted dedup-index serving — corpus signed once per
        # multiplier (first call; excluded by min-of-2), then a FIXED
        # 8-doc increment queries it: the increment's ~256 banded keys
        # prune most of the 1024 bucket dirs, so the wall tracks the
        # increment, not the corpus
        "dedup_index_query": lambda d, e: _dedup_index_probe(d),
        # r9 (VERDICT r8 #7): 8 increments in ONE pruned pass — divide
        # this wall by 8 for the per-increment steady-state figure
        "dedup_index_batch8": lambda d, e: _dedup_index_batch_probe(d),
        "dedup_index_batch8_sized": lambda d, e: _dedup_index_batch_sized_probe(d),
        # r8 (VERDICT r7 #7): same serving queries AFTER the full
        # append+delete+compact lifecycle — fragmented-then-compacted
        # walls must match the fresh-build rows above
        "ivf_index_search_compacted": lambda d, e: _ivf_frag_probe(e),
        "dedup_index_query_compacted": lambda d, e: _dedup_frag_probe(d),
        # r8: persisted BM25 inverted index — corpus tokenized once per
        # multiplier (first call; excluded by min-of-2), then a fixed
        # 3-term query reads only its posting buckets: the wall should
        # track the query terms' posting mass, not the corpus
        "text_index_search": lambda d, e: _text_index_probe(d),
        # r7: one broadcast matmul pass over the corpus; the bench side
        # is FIXED (copy-0's 200 vectors at every multiplier — 2000 is
        # the x1 embeddings row count), so the curve measures the pure
        # corpus scan
        "semantic_decontaminate": lambda d, e: similarity.semantic_contamination(
            e.filter(F.col("vec_id") % 10 != 0),
            e.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 2000)),
            threshold=0.35,
        ),
    }

    import hashlib as _hashlib
    import tempfile as _tempfile

    _ivf_built: set = set()

    def _telemetry_probe(e):
        cents = cluster.seed_centroids(e, "embedding", "vec_id", 64)
        out, prof, drift = cluster.telemetry_report(
            e, cents, ref=e.filter(F.col("vec_id") % 2 == 0)
        )
        run(out)
        run(prof)
        return drift  # third drain happens in the timed run() outside

    def _ivf_index_probe(e):
        mx = e.agg(F.max("vec_id")).collect()[0][0]
        path = os.path.join(
            _tempfile.gettempdir(),
            f"shc_ivf_probe_{_hashlib.md5(str(mx).encode()).hexdigest()[:8]}",
        )
        if path not in _ivf_built:
            similarity.build_ivf_index(e, path, "embedding", "vec_id", dim=64,
                                       num_centroids=64)
            _ivf_built.add(path)
        q = e.filter(F.col("vec_id") < 16)
        return similarity.ivf_index_topk(spark, path, q, k=5, nprobe=8)

    _ivf_frag_built: set = set()

    def _ivf_frag_probe(e):
        # VERDICT r7 #7 SLA probe: the index goes through the FULL
        # serving lifecycle (build on half, 3 append generations,
        # tombstone delete, major compaction) before the measured
        # query — its wall must match the fresh-build curve, proving
        # compaction actually restores the one-file-per-partition
        # pruned-read shape after fragmentation
        mx = e.agg(F.max("vec_id")).collect()[0][0]
        path = os.path.join(
            _tempfile.gettempdir(),
            f"shc_ivf_frag_{_hashlib.md5(str(mx).encode()).hexdigest()[:8]}",
        )
        if path not in _ivf_frag_built:
            similarity.build_ivf_index(
                e.filter(F.col("vec_id") % 2 == 0), path, "embedding",
                "vec_id", dim=64, num_centroids=64,
            )
            for k in range(3):
                similarity.append_to_ivf_index(
                    e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") % 3 == k)),
                    path, "embedding", "vec_id",
                )
            similarity.delete_from_ivf_index(spark, path, list(range(100, 116)))
            similarity.compact_ivf_index(spark, path)
            _ivf_frag_built.add(path)
        q = e.filter(F.col("vec_id") < 16)
        return similarity.ivf_index_topk(spark, path, q, k=5, nprobe=8)

    _didx_built: set = set()

    def _dedup_index_probe(d):
        mx = d.agg(F.max("doc_id")).collect()[0][0]
        path = os.path.join(
            _tempfile.gettempdir(),
            f"shc_didx_probe_{_hashlib.md5(str(mx).encode()).hexdigest()[:8]}",
        )
        if path not in _didx_built:
            dedup.build_dedup_index(
                d, path, num_perm=32, bands=16, n=3, num_buckets=1024
            )
            _didx_built.add(path)
        inc = d.filter(F.col("doc_id") < 8)
        return dedup.dedup_index_pairs(spark, path, inc)

    def _dedup_index_batch_probe(d):
        # the micro-batch serving shape (r9): EIGHT increments in one
        # pruned pass over the same index as dedup_index_query — the
        # per-increment wall is this row's wall / 8, to compare against
        # the single-call row (fixed job overhead amortizes across the
        # batch)
        mx = d.agg(F.max("doc_id")).collect()[0][0]
        path = os.path.join(
            _tempfile.gettempdir(),
            f"shc_didx_probe_{_hashlib.md5(str(mx).encode()).hexdigest()[:8]}",
        )
        if path not in _didx_built:
            dedup.build_dedup_index(
                d, path, num_perm=32, bands=16, n=3, num_buckets=1024
            )
            _didx_built.add(path)
        incs = {
            f"i{r}": d.filter(F.col("doc_id") % 8 == r).filter(F.col("doc_id") < 64)
            for r in range(8)
        }
        return dedup.dedup_index_pairs_batch(spark, path, incs)

    _didx_sized_built: set = set()

    def _dedup_index_batch_sized_probe(d):
        # r10 (VERDICT r9 #4): same 8-increment batch over an index
        # built with AUTO-SIZED num_buckets (suggest_num_buckets from
        # corpus row count + expected batch coverage) instead of the
        # fixed 1024 — at x100 the sized tree keeps the batch's bucket
        # union a sub-scan, flattening the batch8 growth curve
        mx = d.agg(F.max("doc_id")).collect()[0][0]
        path = os.path.join(
            _tempfile.gettempdir(),
            f"shc_didx_sized_{_hashlib.md5(str(mx).encode()).hexdigest()[:8]}",
        )
        if path not in _didx_sized_built:
            dedup.build_dedup_index(d, path, num_perm=32, bands=16, n=3)
            _didx_sized_built.add(path)
        incs = {
            f"i{r}": d.filter(F.col("doc_id") % 8 == r).filter(F.col("doc_id") < 64)
            for r in range(8)
        }
        return dedup.dedup_index_pairs_batch(spark, path, incs)

    _tidx_built: set = set()

    def _text_index_probe(d):
        from shc_spark.operators import textindex

        mx = d.agg(F.max("doc_id")).collect()[0][0]
        path = os.path.join(
            _tempfile.gettempdir(),
            f"shc_tidx_probe_{_hashlib.md5(str(mx).encode()).hexdigest()[:8]}",
        )
        if path not in _tidx_built:
            textindex.build_text_index(d, path, num_buckets=256)
            _tidx_built.add(path)
        return textindex.text_index_topk(spark, path, ["join", "scan", "vector"], k=20)

    _didx_frag_built: set = set()

    def _dedup_frag_probe(d):
        # lifecycle twin of _dedup_index_probe: build on a quarter,
        # append the rest in 3 generations, tombstone, compact — the
        # measured increment query must match the fresh-build curve
        mx = d.agg(F.max("doc_id")).collect()[0][0]
        path = os.path.join(
            _tempfile.gettempdir(),
            f"shc_didx_frag_{_hashlib.md5(str(mx).encode()).hexdigest()[:8]}",
        )
        if path not in _didx_frag_built:
            dedup.build_dedup_index(
                d.filter(F.col("doc_id") % 4 == 0), path,
                num_perm=32, bands=16, n=3, num_buckets=1024,
            )
            for k in (1, 2, 3):
                dedup.append_to_dedup_index(d.filter(F.col("doc_id") % 4 == k), path)
            dedup.delete_from_dedup_index(spark, path, list(range(100, 116)))
            dedup.compact_dedup_index(spark, path)
            _didx_frag_built.add(path)
        inc = d.filter(F.col("doc_id") < 8)
        return dedup.dedup_index_pairs(spark, path, inc)

    from shc_spark.operators import sessions

    EV_OPS = {
        # id-shifted copies replicate each user's history m times in
        # place, so per-user session structure (the window's work) is
        # the thing being scaled
        "sessionize_batch": lambda ev: sessions.session_stats(
            ev, "user_id", "ts", 1800, tiebreak_col="event_id"
        ),
        # r13: deterministic-sampling quantile sketch — build is a
        # map-only md5-band filter, the query aggregates ~12.5% of the
        # corpus per group; expect a near-data-scan curve
        "quantile_sketch": lambda ev: __import__(
            "shc_spark.operators.sketch", fromlist=["sketch"]
        ).quantile_sketch_query(
            __import__(
                "shc_spark.operators.sketch", fromlist=["sketch"]
            ).quantile_sketch(ev, "event_type", "value", "event_id")
        ),
        # DEFAULT path (approximate="auto" since r9): exact below 100k
        # avg rows/group, sketch above — the curve a naive caller gets
        "anomaly_robust_z": lambda ev: __import__(
            "shc_spark.operators.stats", fromlist=["stats"]
        ).anomaly_robust_z(
            ev.select("event_id", "event_type", "value"), "value", ["event_type"]
        ),
        "anomaly_robust_z_exact": lambda ev: __import__(
            "shc_spark.operators.stats", fromlist=["stats"]
        ).anomaly_robust_z(
            ev.select("event_id", "event_type", "value"), "value", ["event_type"],
            approximate=False,
        ),
        # the 100 TB path: approx_percentile median/MAD — one
        # map-side-combined aggregate per stat, no per-group sort
        "anomaly_robust_z_approx": lambda ev: __import__(
            "shc_spark.operators.stats", fromlist=["stats"]
        ).anomaly_robust_z(
            ev.select("event_id", "event_type", "value"), "value", ["event_type"],
            approximate=True,
        ),
        "event_funnel": lambda ev: __import__(
            "shc_spark.operators.behavior", fromlist=["behavior"]
        ).funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]),
        "cohort_retention": lambda ev: __import__(
            "shc_spark.operators.behavior", fromlist=["behavior"]
        ).cohort_retention(ev, "user_id", "ts"),
        # binned range join: id-shifted copies share the SAME ts axis,
        # so without a key the (clicks x intervals) pair OUTPUT itself
        # grows m^2 (the unsalted-dedup confound); joining per copy
        # (on=cpy, derived from the shifted id space) keeps the true
        # pair structure linear and measures the ALGORITHM's curve
        "range_join_binned": lambda ev: _range_join_probe(ev),
        # PSI drift: two aggregate scans + tiny histogram math; the
        # flattest curve on the board if the design is right
        "psi_drift": lambda ev: __import__(
            "shc_spark.operators.dq", fromlist=["dq"]
        ).psi_drift(
            ev.filter(F.dayofmonth("ts") <= 15).select("value"),
            ev.filter(F.dayofmonth("ts") > 15).select("value"),
            "value",
            [10.0, 20.0, 50.0, 100.0],
        ),
    }

    def _range_join_probe(ev):
        from shc_spark.operators.ranges import range_join

        n0 = 100_000  # sf0.1 events row count == inflate's id-shift
        # stride, so cpy is constant within a copy and distinct
        # across copies
        with_cpy = ev.withColumn("cpy", (F.col("event_id") / n0).cast("long"))
        iv = with_cpy.filter(
            (F.col("event_type") == "purchase") & (F.col("event_id") % 13 == 0)
        ).select(
            "cpy",
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
        )
        pts = with_cpy.filter(F.col("event_type") == "click").select("cpy", "ts")
        return range_join(pts, iv, "ts", "s", "e", on=["cpy"]).groupBy(
            "interval_id"
        ).agg(F.count(F.lit(1)).alias("n"))

    def classifier_probe(docs):
        # 2 GD iterations: per-iteration cost = one corpus pass + one
        # dim-vector partial per partition; wall should scale with the
        # corpus, driver traffic with partitions only
        from shc_spark.operators import classifier as clf

        labeled = docs.withColumn("label", (F.col("source") == "src0").cast("int"))
        w, b, _ = clf.train_quality_classifier(
            labeled, "text", "label", dim=2**14, iters=2, lr=2.0
        )
        return clf.score_texts(docs, w, b, "text", "doc_id")

    OPS["quality_classifier"] = lambda d, e: classifier_probe(d)

    def curation_probe(docs):
        # r13: the 4-rule sequential chain over the salted corpus. The
        # probe's dedup rule normalizes via the TRANSLATE-based key
        # (the recommended cheap path; the regexp_replace equivalent is
        # the documented ~10 MB/s hazard the SNM row measured); the
        # decontamination rule dominates (gram-stream exchange).
        from shc_spark.operators import dedup as _dd
        from shc_spark.operators import linkage as _lk

        bench = docs.filter(F.col("source") == "src0")

        def dup_drops(s):
            norm = s.withColumn("nt", _lk.normalized_key(F.col("text"), 4096))
            keep = _dd.exact_dedup(norm, ["nt"], "doc_id").select("doc_id")
            return s.select("doc_id").join(keep, "doc_id", "left_anti")

        rules = [
            ("too_short", lambda s: s.filter(F.length("text") < 150).select("doc_id")),
            ("exact_dup", dup_drops),
            ("contaminated",
             lambda s: text.decontaminate(
                 s.filter(F.col("source") != "src0"), bench, "text", "doc_id", n=5
             ).select(F.col("id").alias("doc_id"))),
            ("low_quality",
             lambda s: text.quality_features(s, "text")
             .filter(F.col("q_score") < 0.5).select("doc_id")),
        ]
        return text.curation_report(docs.select("doc_id", "source", "text"),
                                    "doc_id", rules)

    OPS["curation_report"] = lambda d, e: curation_probe(d)

    # ops that read ONLY the embeddings table: an --only run restricted
    # to these skips the (much heavier) documents/events inflation —
    # at x1000 the unconditional events localCheckpoint alone OOM'd an
    # embeddings-only probe
    EMB_ONLY = {
        "sim_topk_lsh", "kmeans_semantic", "dedup_semdedup",
        "dedup_semdedup_auto", "dedup_semdedup_sharded", "embed_quantize",
        "embed_balanced_sample", "embed_drift", "embed_outliers",
        "embed_telemetry_report",
        "semantic_decontaminate",
        "ivf_index_search", "ivf_index_search_compacted",
    }
    sel_ops = [op for op in OPS if only is None or op in only]
    sel_ev = [op for op in EV_OPS if only is None or op in only]
    emb_only_run = bool(sel_ops) and all(op in EMB_ONLY for op in sel_ops)

    rows = []
    for m in mults:
        docs = inflate(
            spark, "documents", "doc_id", 1 if emb_only_run else m,
            salt_col="text",
        )
        emb = inflate(spark, "embeddings", "vec_id", m)
        ev = inflate(spark, "events", "event_id", m) if sel_ev else None
        nd, ne = docs.count(), emb.count()
        for op, fn in OPS.items():
            if only is not None and op not in only:
                continue
            walls = []
            for _ in range(2):
                t0 = time.time()
                run(fn(docs, emb))
                walls.append(time.time() - t0)
            rows.append((m, nd, ne, op, round(min(walls), 2)))
            print(rows[-1], flush=True)
        for op, fn in EV_OPS.items():
            if only is not None and op not in only:
                continue
            walls = []
            for _ in range(2):
                t0 = time.time()
                run(fn(ev))
                walls.append(time.time() - t0)
            rows.append((m, nd, ne, op, round(min(walls), 2)))
            print(rows[-1], flush=True)
        docs.unpersist()
        emb.unpersist()
        if ev is not None:
            ev.unpersist()

    by_op: dict = {}
    for m, nd, ne, op, wall in rows:
        by_op.setdefault(op, []).append((m, nd, wall))
    lines = [
        "# SCALE — measured operator scaling (inflated sf0.1 corpus)",
        "",
        "`tools/scale_probe.py`: N copies of documents (5k rows each) /",
        "embeddings (2k each), min-of-2 walls on local[32]. Document",
        "copies are text-salted (a per-copy suffix on EVERY token, so",
        "cross-copy Jaccard is exactly 0) so corpus SIZE scales N x",
        "while the true near-dup pair structure stays ~linear —",
        "unsalted copies make every doc an N-way duplicate cluster and",
        "the pair OUTPUT itself Theta(N^2), which confounds the curve.",
        "The ratio column is wall(N)/wall(1) vs the ideal N —",
        "sub-ideal ratios mean fixed overhead still dominates;",
        "super-ideal growth would flag a quadratic term no small",
        "benchmark can see. anomaly_robust_z carries the steepest",
        "curve by design: exact per-group medians sort each group's",
        "full window twice (per-group parallel, spill-safe);",
        "anomaly_robust_z_approx is the approximate=True scale path",
        "(approx_percentile median/MAD, no per-group sort) measured on",
        "the identical inputs.",
        "",
        "Duplicate-stress datapoints (x100 runs, 2026-08-14):",
        "- unsalted: 500k docs = 5k clusters of 100 identical copies =",
        "  24.75M true pairs; `dedup_minhash_lsh` emitted the full",
        "  exact-verified pair set in 63.5 s (~390k verified pairs/s) —",
        "  the quadratic is the required output, not the algorithm.",
        "- sparse salt (1 marker per 5 words): cross-copy Jaccard ~0.33",
        "  is below the 0.8 output threshold but still collides per",
        "  r=2 band with p~j^2=0.11, so ~84% of the Theta(N^2)",
        "  cross-copy pairs came back as candidates (85 s at x100) —",
        "  a measured reminder that permissive banding (low r), not",
        "  the pair join, is what blows up on low-similarity-rich",
        "  corpora; raise r/num_perm when the corpus is like that.",
        "",
        "| operator | " + " | ".join(f"x{m} wall (s)" for m in mults) + " | ratio vs x1 |",
        "|---|" + "---|" * (len(mults) + 1),
    ]
    for op, series in by_op.items():
        walls = [w for _, _, w in series]
        ratio = round(walls[-1] / walls[0], 1) if walls[0] else float("nan")
        lines.append(
            f"| {op} | " + " | ".join(str(w) for w in walls) + f" | {ratio}x at x{mults[-1]} |"
        )
    if only is not None:
        # Partial run: print the measured rows for hand-merging into
        # SCALE.md — a full rewrite here would drop every other
        # operator's columns and skip the connector table.
        for ln in lines[-len(by_op):]:
            print(ln)
        return
    lines += connector_probe(spark)
    with open(os.path.join(REPO, "SCALE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
