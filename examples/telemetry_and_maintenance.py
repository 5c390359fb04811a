"""Round-15 additions: one-pass embedding telemetry, the async
snapshot fold, and the streaming drift monitor.

1. TELEMETRY REPORT — `cluster.telemetry_report` runs the chunked
   assignment kernel ONCE and derives outliers + cluster profile +
   drift from the pinned (id, cluster, dist) frame; each output is
   value-exact vs its standalone operator (shared expression helpers).
   At the 100-TB shape this turns three corpus scans into one (plus
   the unavoidable drift-reference scan).
2. ASYNC SNAPSHOT FOLD — `append_to_dedup_index(..., async_fold=True)`
   returns at the ~2s sidecar wall while the O(num_buckets) fold runs
   in a daemon thread over a FILE SNAPSHOT (appends landing during the
   fold survive as the next generation); `wait_for_fold` joins it at a
   batch boundary.
3. STREAMING DRIFT — `run_streaming_embed_drift` watches PSI per
   event-time window as vectors ARRIVE (stateless assign; bounded
   windows x k state) instead of re-scanning the corpus.

Run: python examples/telemetry_and_maintenance.py
"""


def main(spark, root=None):
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from shc_spark.operators import cluster, dedup
    from shc_spark.streaming import run_streaming_embed_drift

    root = root or tempfile.mkdtemp(prefix="shc_telemetry_")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))

    # -- 1. the whole telemetry family off one assign pass --------------
    cents = cluster.seed_centroids(emb, "embedding", "vec_id", 8)
    cur = emb.filter(F.col("vec_id") % 2 == 1)
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    outliers, profile, drift = cluster.telemetry_report(cur, cents, ref=ref)
    psi = drift.agg(F.round(F.sum("psi_contrib"), 6)).collect()[0][0]
    fringe = outliers.where(F.col("pct") >= 0.9).count()
    prof_rows = profile.collect()
    assert {r["cluster"] for r in prof_rows} <= set(range(8))
    print(f"telemetry_report: PSI(ref->cur)={psi}, fringe(pct>=0.9)={fringe}, "
          f"profile rows={len(prof_rows)} — all from ONE corpus scan")
    # value-exact vs the standalone op (shared helpers make this true
    # by construction; asserting it keeps the example honest)
    alone = sorted(map(tuple, cluster.cluster_profile(cur, cents).collect()))
    assert sorted(map(tuple, prof_rows)) == alone

    # -- 2. async snapshot fold -----------------------------------------
    dpath = os.path.join(root, "dedup_index")
    dedup.build_dedup_index(
        docs.filter(F.col("doc_id") % 2 == 0), dpath, num_perm=64, bands=32, n=3
    )
    dedup.append_to_dedup_index(
        docs.filter(F.col("doc_id") % 4 == 1), dpath, bucketed=False,
        fold_threshold=1, async_fold=True,  # threshold trips -> fold in thread
    )
    dedup.wait_for_fold(dpath)  # batch boundary: join + surface errors
    assert not dedup._has_pending(dpath), "async fold drained the sidecar"
    q = docs.filter(F.col("doc_id") % 4 == 3)
    pairs = dedup.dedup_index_pairs(spark, dpath, q).count()
    print(f"async fold: sidecar folded in background; query sees {pairs} pairs")

    # -- 3. streaming drift monitor -------------------------------------
    windows = run_streaming_embed_drift(spark, sf, k=8)
    per_win = (
        windows.groupBy("window_start")
        .agg(F.round(F.sum("psi_contrib"), 4).alias("psi"))
        .orderBy("window_start")
        .collect()
    )
    assert per_win, "at least one event-time window drained"
    print("streaming drift per window:",
          {r["window_start"]: r["psi"] for r in per_win})

    shutil.rmtree(root, ignore_errors=True)
    print("telemetry_and_maintenance example OK")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from shc_spark.session import get_spark

    main(get_spark("example-telemetry-maintenance", cpus=8))
