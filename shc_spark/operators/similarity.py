"""Similarity search over embedding columns (array<float>).

All three paths share one execution shape, the right one for a corpus
that is huge and a query set that is small:

- the query side is collected into a numpy matrix and shipped to
  executors via the UDF closure / Spark broadcast (exactly what a
  broadcast hash join does with its build side);
- the corpus NEVER shuffles: one `mapInPandas` pass computes, per
  Arrow batch, the candidate set and its cosine scores as numpy
  matmuls, and emits only the per-batch top-k per query;
- the single shuffle in any plan is the final global top-k window,
  whose input is ~num_batches * nq * k rows, not |corpus| * nq.

Partitioning comes from the source (a 100 TB corpus arrives with
thousands of parquet splits); no repartition is forced — at bench
scale a forced widen costs a full shuffle stage to parallelize
microseconds of matmul.

- cosine_topk: exact brute force — every corpus row is a candidate.
- lsh_topk: multi-table random-hyperplane LSH. Bucket ids, probe
  matching (exact bucket + 1-bit flips), scoring, and local top-k all
  happen inside the one corpus pass; a corpus row's candidacy for all
  tables is resolved in its own batch, so candidates are globally
  unique without any dedup shuffle.
- ivf_topk: IVF-style coarse quantization with deterministic seeded
  centroids; each corpus row joins its single nearest centroid's
  posting list, queries probe their nprobe nearest lists.

Round-1 lesson baked in here: per-candidate `F.aggregate(zip_with())`
dots are interpreted per row and made both ANN paths slower than the
brute force they approximate; and every extra stage (explode + bucket
equi-join + dedup groupBy) costs more at moderate scale than the
masked matmul it saves.

API change (round 6): the collected query side is bounded — every
top-k entry point raises ``ValueError`` once the query set exceeds
``MAX_QUERY_ROWS`` (100_000) instead of silently collecting it to the
driver. Callers with genuinely larger query sets must pass
``max_queries=<n>`` explicitly (and accept the driver memory bill) or
chunk their query set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# The query side of every top-k path is collected to the driver and
# broadcast (the build side of a broadcast hash join). That is the
# right 100 TB shape ONLY while the query set is small; pointing
# `queries` at a large table must fail loudly, not OOM the driver.
MAX_QUERY_ROWS = 100_000


def _bounded_query_rows(queries: DataFrame, cols, max_queries: int):
    """Collect the query side with the repo's limit-and-raise guard
    (same convention as dedup.embedding_near_dups / index fetch):
    limit(n+1) proves overflow without materializing the overflow."""
    rows = queries.select(*cols).limit(max_queries + 1).collect()
    if len(rows) > max_queries:
        raise ValueError(
            f"query side exceeds max_queries={max_queries} rows; the "
            f"top-k operators broadcast the query set to every executor "
            f"(corpus and queries are not symmetric). Swap the sides, "
            f"pre-filter the queries, or raise max_queries explicitly."
        )
    return rows


def _collect_queries(
    queries: DataFrame, vec_col: str, id_col: str, max_queries: int = MAX_QUERY_ROWS
):
    """(ids list, normalized float64 matrix) for the small query side.
    Empty query sets return an empty matrix (callers emit nothing)."""
    rows = _bounded_query_rows(queries, (id_col, vec_col), max_queries)
    ids = [r[0] for r in rows]
    if not rows:
        return ids, np.zeros((0, 1), dtype=np.float64)
    qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    n = np.linalg.norm(qm, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return ids, qm / n


def collect_query_side(
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_queries: int = MAX_QUERY_ROWS,
):
    """ONE bounded driver collect of the query side, reusable across
    several top-k calls over the SAME query frame via their
    ``precollected`` parameter. A gate that scores two rankings over
    one query set (an index search judged against an exact or
    reference ranking) otherwise collects — and re-runs the query
    frame's upstream scan — once PER ranking; at any corpus scale
    that is duplicated driver ingress and a duplicated source job for
    byte-identical (ids, normalized matrix) output."""
    return _collect_queries(queries, vec_col, id_col, max_queries)


def _normalize_batch(vecs) -> np.ndarray:
    M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


# slack added to per-batch pruning cutoffs: any binary rounding of a
# double moves it by < 1e-4/2 + representation eps, so a row whose
# unrounded cosine is more than 1e-4 below the kth-best can never
# outrank it after F.round(..., 4). Pruning by UNROUNDED score with
# this slack is provably lossless without replicating Java's
# BigDecimal HALF_UP (floor(x*1e4+0.5) disagrees with it on values
# like 0.72525 whose double sits just below the boundary).
_ROUND_SLACK = 1e-4


def _emit_topk(q_ids, ids, S, cand_lists, k):
    """Per-batch candidate pruning per query: emit every row whose
    unrounded cosine is within _ROUND_SLACK of the batch's kth-best —
    a superset of any batch rows the global window (rounded cosine
    desc, id asc) could rank in its top k. ``cand_lists[j]`` holds the
    batch-row indices that are candidates for query j (None = all).
    Yields pandas DataFrames."""
    for j, qid in enumerate(q_ids):
        rows = cand_lists[j] if cand_lists is not None else None
        if rows is None:
            rows = np.arange(len(ids))
        elif len(rows) == 0:
            continue
        else:
            rows = np.asarray(rows)
        rows = rows[ids[rows] != qid]  # self-matches excluded
        if not len(rows):
            continue
        s = S[rows, j]
        if len(rows) > k:
            kth = np.partition(s, len(s) - k)[len(s) - k]
            keep = s >= kth - _ROUND_SLACK
            rows, s = rows[keep], s[keep]
        yield pd.DataFrame(
            {
                "query_id": [qid] * len(rows),
                "neighbor_id": ids[rows],
                "cosine": s,
            }
        )


def _topk_window(part: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        part.withColumn("cosine", F.round("cosine", 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _run(corpus: DataFrame, vec_col: str, id_col: str, k: int, score_fn) -> DataFrame:
    id_type = corpus.schema[id_col].dataType.simpleString()
    part = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).mapInPandas(score_fn, f"query_id {id_type}, neighbor_id {id_type}, cosine double")
    return _topk_window(part, k)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    max_queries: int = MAX_QUERY_ROWS,
    precollected: "tuple | None" = None,
) -> DataFrame:
    """Exact cosine top-k of corpus for each query vector.

    Output: query_id, neighbor_id, cosine (4dp), rank. Ties broken by
    neighbor id -> fully deterministic. Self-matches excluded.
    ``precollected`` accepts a collect_query_side() result to share
    one query collect across several rankings of the same frame."""
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast(
        precollected
        if precollected is not None
        else _collect_queries(queries, vec_col, id_col, max_queries)
    )

    def score(batches):
        q_ids, q_mat = bq.value
        if not q_ids:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            S = _normalize_batch(pdf["__vec"]) @ q_mat.T  # (batch, nq)
            yield from _emit_topk(q_ids, ids, S, None, k)

    return _run(corpus, vec_col, id_col, k, score)


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_bench: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Embedding-level benchmark decontamination: per corpus row, the
    max cosine against ANY benchmark vector, and a contaminated flag
    at ``threshold`` — the semantic analog of n-gram decontamination
    (text.decontaminate) for paraphrased eval leakage that shares no
    surface n-grams.

    Output: (id, max_cos 4dp, contaminated). The benchmark set is
    collected (bounded by ``max_bench``, limit-and-raise) and shipped
    as one normalized broadcast matrix; the corpus is scanned ONCE —
    one matmul + row-max per Arrow batch, zero shuffles, so the plan
    is a pure map over the corpus at any scale. Rows whose id is also
    in the benchmark are NOT excluded — pre-filter the corpus if the
    sets overlap."""
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast(
        _collect_queries(benchmark, vec_col, id_col, max_bench)
    )
    id_type = corpus.schema[id_col].dataType.simpleString()

    def score(batches):
        b_ids, b_mat = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            if not b_ids:
                mc = np.zeros(len(ids))
            else:
                mc = (_normalize_batch(pdf["__vec"]) @ b_mat.T).max(axis=1)
            yield pd.DataFrame({"id": ids, "max_cos": np.round(mc, 4)})

    out = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).mapInPandas(score, f"id {id_type}, max_cos double")
    return out.select(
        "id", "max_cos", (F.col("max_cos") >= threshold).alias("contaminated")
    )


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    pool: int = 8,
    lam: float = 0.7,
    div_weight: float | None = None,
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    retrieve a ``pool``-sized candidate set per query, then greedily
    select ``k`` results maximizing
    ``lam * rel(q, c) - div_weight * max_{s in selected} sim(c, s)`` —
    the standard diversity-aware serving step (dedupes near-identical
    retrieval hits before they reach a prompt).

    Scale shape: stage 1 is the distributed ``cosine_topk`` (corpus
    never shuffles); stage 2 is applyInPandas over per-query groups of
    exactly ``pool`` rows — the greedy loop touches pool x dim floats
    per query, never the corpus.

    Determinism contract (mirrors cosine_topk): rel is the stage-1
    4dp-rounded cosine and pairwise sims round to 4dp before the max
    (raw cosines have no decimal structure, so 4dp rounding is
    engine-stable); the score itself stays UNROUNDED — it is a fixed
    IEEE expression over those canonical inputs, hence bit-identical
    across engines, while rounding it WOULD sit exactly on decimal
    boundaries (0.7 x a 4dp value has a terminal 5 half the time) and
    flip between rounding conventions. Ties break by ascending
    neighbor id. Pass ``div_weight`` explicitly when an oracle needs
    an exact decimal (the default ``1 - lam`` is inexact in binary:
    1 - 0.7 != 0.3).

    Output: (query_id, neighbor_id, step, mmr_score), step = 1..k in
    selection order.
    """
    if div_weight is None:
        div_weight = 1.0 - lam
    cands = cosine_topk(queries, corpus, vec_col, id_col, k=pool, max_queries=max_queries)
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nvec")
    )
    pooled = cands.join(vecs, "neighbor_id").select(
        "query_id", "neighbor_id", "cosine", "__nvec"
    )
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, step int, mmr_score double"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        U = _normalize_batch(pdf["__nvec"])
        S = np.round(U @ U.T, 4)
        n = len(ids)
        # max-sim over the SELECTED set: empty at step 1 (diversity
        # term is absent, not zero) and thereafter the true max, which
        # may be NEGATIVE — seeding with zeros would clamp it
        maxsim = None
        alive = np.ones(n, dtype=bool)
        rows = []
        for step in range(1, min(k, n) + 1):
            if maxsim is None:
                sc = lam * rel
            else:
                sc = lam * rel - div_weight * maxsim
            # argmax with ties by ascending id, among alive candidates
            best, best_key = -1, None
            for i in np.flatnonzero(alive):
                key = (-sc[i], ids[i])
                if best_key is None or key < best_key:
                    best, best_key = i, key
            rows.append((pdf["query_id"].iloc[0], ids[best], step, sc[best]))
            alive[best] = False
            sel = S[:, best]
            maxsim = sel.copy() if maxsim is None else np.maximum(maxsim, sel)
        return pd.DataFrame(
            rows, columns=["query_id", "neighbor_id", "step", "mmr_score"]
        )

    return (
        pooled.groupBy("query_id")
        .applyInPandas(greedy, schema=out_schema)
        .select("query_id", "neighbor_id", "step", "mmr_score")
    )


def sq8_topk(
    queries: DataFrame,
    codes: DataFrame,
    stats: list,
    codes_col: str = "codes",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    levels: int = 256,
    max_queries: int = MAX_QUERY_ROWS,
    precollected: "tuple | None" = None,
) -> DataFrame:
    """Cosine top-k over an SQ8-COMPRESSED corpus (see
    operators/quantize.py): the scan reads int8-range codes — 4x less
    I/O and cache footprint than float32 — and each Arrow batch
    reconstructs vectors with one affine numpy op (mn + code * step)
    before the same batched matmul scoring as cosine_topk. Queries
    stay full-precision. At 255 levels the score error per dim is
    <= span/510, so recall@k is near-exact (pinned by test); pair with
    exact re-ranking of the union top-k' when exactness matters."""
    mn = np.array([s[0] for s in stats], dtype=np.float64)
    step = np.array([(s[1] - s[0]) / (levels - 1) for s in stats], dtype=np.float64)
    spark = codes.sparkSession
    bq = spark.sparkContext.broadcast(
        precollected
        if precollected is not None
        else _collect_queries(queries, vec_col, id_col, max_queries)
    )

    def score(batches):
        q_ids, q_mat = bq.value
        if not q_ids:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            C = np.stack([np.asarray(c, dtype=np.float64) for c in pdf["__vec"]])
            M = mn + C * step
            n = np.linalg.norm(M, axis=1, keepdims=True)
            n[n == 0] = 1.0
            S = (M / n) @ q_mat.T
            yield from _emit_topk(q_ids, ids, S, None, k)

    return _run(codes, codes_col, id_col, k, score)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    num_tables: int = 8,
    planes_per_table: int = 8,
    multiprobe: bool = True,
    seed: int = 7,
    max_queries: int = MAX_QUERY_ROWS,
    precollected: "tuple | None" = None,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH.

    A query scores only corpus rows sharing a bucket in >=1 of
    ``num_tables`` tables (plus 1-bit-flip probes per table):
    P[candidate] = 1 - (1 - p^planes)^tables for per-plane agreement
    p = 1 - theta/pi. At the defaults (8 tables x 8 planes = 256
    buckets/table, 9 probes) a query scores ~L*(1+planes)/2^planes
    ~= 28% of the corpus; the fraction shrinks geometrically with
    planes_per_table as the corpus grows — tune both up at scale.

    The probe map {(table, bucket) -> query rows} is built driver-side
    (nq * tables * (1+planes) entries) and rides the UDF closure;
    bucketing (sign-LSH is scale-invariant — raw vectors hash
    directly), candidate masking, scoring, and local top-k all run in
    the single corpus pass."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, planes_per_table, dim))
    weights = (1 << np.arange(planes_per_table)).astype(np.int64)
    flat = planes.reshape(num_tables * planes_per_table, dim)

    q_ids, qm = (
        precollected
        if precollected is not None
        else _collect_queries(queries, vec_col, id_col, max_queries)
    )
    probe_map: dict = {}
    for t in range(num_tables if q_ids else 0):
        b0 = (((qm @ planes[t].T) > 0) * weights).sum(axis=1).astype(np.int64)
        for qi in range(len(q_ids)):
            cand_bkts = [int(b0[qi])]
            if multiprobe:
                cand_bkts += [int(b0[qi]) ^ (1 << p) for p in range(planes_per_table)]
            for b in cand_bkts:
                probe_map.setdefault((t, b), []).append(qi)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, qm, probe_map))

    def score(batches):
        qids_, qm_, pmap = bc.value
        if not qids_:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            M = _normalize_batch(pdf["__vec"])
            # (batch, tables) bucket ids — normalization doesn't change
            # signs, so hashing the normalized matrix is equivalent
            signs = (M @ flat.T) > 0
            bkts = (
                signs.reshape(len(M), num_tables, planes_per_table) * weights
            ).sum(axis=2)
            cand = [set() for _ in qids_]
            for t in range(num_tables):
                col = bkts[:, t]
                for i in range(len(ids)):
                    for qi in pmap.get((t, int(col[i])), ()):
                        cand[qi].add(i)
            S = M @ qm_.T
            yield from _emit_topk(
                qids_, ids, S, [sorted(c) for c in cand], k
            )

    return _run(corpus, vec_col, id_col, k, score)


def _train_centroids(
    corpus: DataFrame,
    vec_col: str,
    num_centroids: int,
    dim: int,
    seed: int,
    sample_rows: int = 4096,
    iters: int = 8,
) -> np.ndarray:
    """Spherical k-means on a bounded corpus sample — how a real IVF
    coarse quantizer is trained at any scale (the quantizer sees a
    sample, the full corpus only gets ASSIGNED). Deterministic
    regardless of partition layout: the sample is the top-N rows by a
    content hash (TakeOrdered — a bare limit() would depend on scan
    order), init is seeded, iterations fixed. Falls back to random
    hyperplane centroids when the sample is smaller than the
    codebook."""
    sample = [
        np.asarray(r[0], dtype=np.float64)
        for r in corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col)))
        .limit(sample_rows)
        .collect()
    ]
    rng = np.random.RandomState(seed)
    if len(sample) < num_centroids:
        cent = rng.standard_normal((num_centroids, dim))
        return cent / np.linalg.norm(cent, axis=1, keepdims=True)
    X = np.stack(sample)
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    X = X / n
    cent = X[rng.choice(len(X), num_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cent.T, axis=1)
        for c in range(num_centroids):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0:
                    cent[c] = m / nm
    return cent


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 11,
    max_queries: int = MAX_QUERY_ROWS,
    centroids=None,
    precollected: "tuple | None" = None,
) -> DataFrame:
    """IVF ANN with a spherical-k-means coarse quantizer trained on a
    bounded corpus sample: corpus rows attach to their single nearest
    centroid (posting list, argmax is scale-invariant so raw vectors
    assign directly); each query scans its nprobe nearest lists —
    nprobe/num_centroids of the corpus in expectation, with balanced
    lists thanks to the trained codebook. Tune num_centroids ~
    sqrt(|corpus|) at scale. ``centroids`` accepts a pre-trained
    (num_centroids, dim) codebook (e.g. from a persisted index) and
    skips training."""
    cent = (
        centroids
        if centroids is not None
        else _train_centroids(corpus, vec_col, num_centroids, dim, seed)
    )

    q_ids, qm = (
        precollected
        if precollected is not None
        else _collect_queries(queries, vec_col, id_col, max_queries)
    )
    probe_map: dict = {}
    if q_ids:
        probe_idx = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
        for qi in range(len(q_ids)):
            for c in probe_idx[qi]:
                probe_map.setdefault(int(c), []).append(qi)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, qm, probe_map))

    def score(batches):
        qids_, qm_, pmap = bc.value
        if not qids_:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            M = _normalize_batch(pdf["__vec"])
            cid = np.argmax(M @ cent.T, axis=1)
            cand = [[] for _ in qids_]
            for i in range(len(ids)):
                for qi in pmap.get(int(cid[i]), ()):
                    cand[qi].append(i)
            S = M @ qm_.T
            yield from _emit_topk(qids_, ids, S, cand, k)

    return _run(corpus, vec_col, id_col, k, score)


# On-disk layout version of the persisted IVF index (centroids/ +
# postings/cid=*/ + tombstones/). Bump on ANY change to the subtree
# schema or partitioning so callers that cache a built index keyed on
# build inputs (e.g. the driver gates under /tmp) rebuild instead of
# silently reading a stale layout.
IVF_INDEX_LAYOUT = 1


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    num_centroids: int | None = 16,
    seed: int = 11,
    storage: str = "float",
    pq_m: int = 8,
    pq_codes: int = 256,
) -> str:
    """Persist an IVF index: train the coarse quantizer (bounded
    sample, deterministic), then write ``centroids/`` (tiny) and
    ``postings/`` PARTITIONED BY cid — the build-once-query-many
    serving shape. A later search reads only its probed partitions
    (Spark partition pruning on cid), touching nprobe/num_centroids
    of the corpus files instead of re-scanning and re-assigning
    everything per query batch, which is what ivf_topk does inline.

    ``storage="sq8"`` stores SQ8 CODES instead of raw vectors (the
    FAISS IVF,SQ8 shape): per-dimension affine quantization trained on
    the corpus (quantize.dim_stats, saved under ``quant/`` — appends
    reuse it, never retrain). Measured 2.3x fewer parquet posting
    bytes at a 20k-vector build (raw width is 4x; parquet already
    squeezes floats some) — at 100 TB that is the difference between
    the probed partitions fitting page cache or not. The search
    dequantizes per Arrow batch with one affine numpy op before the
    same scoring (score error per dim <= span/510, recall@k
    near-exact — the sim_topk_sq8 trade, now on the serving path).

    ``storage="pq"`` stores PQ CODES (the FAISS IVF,PQ shape —
    VERDICT r8 #4): ``pq_m`` subspace codebooks of ``pq_codes``
    centroids each, trained on the same bounded deterministic sample
    discipline (quantize.train_pq) and saved under ``pq/`` — appends
    encode under the saved books, never retrain. Posting bytes drop
    to m small ints per vector (m=8 over dim=64 float64 is the 16-32x
    tier that makes a 100 TB index fit), at the cost that the search
    scores by PQ asymmetric distance (cosine ~ 1 - adist/2 on the
    unit sphere) instead of exact cosines — recall governed by
    (nprobe, m, pq_codes); re-rank survivors against a full-precision
    store (ivf_index_topk(rerank_with=...)) to buy exactness back."""
    import os

    if storage not in ("float", "sq8", "pq"):
        raise ValueError(f"storage must be 'float', 'sq8' or 'pq', got {storage!r}")
    if num_centroids is None:
        # corpus-derived ~sqrt(n) sizing (VERDICT r9 #4): balanced
        # posting lists at deploy scale. Callers pinning a recall
        # contract (fixed nprobe/num_centroids ratio) pass explicitly.
        from shc_spark.operators.idxcache import suggest_num_centroids

        num_centroids = suggest_num_centroids(corpus.count())
    cent = _train_centroids(corpus, vec_col, num_centroids, dim, seed)
    spark = corpus.sparkSession
    # REBUILD over a live index stages the whole tree and swaps at the
    # end (VERDICT r10 #8): a crash mid-build leaves the old index
    # intact - never new centroids next to old postings (whose cids
    # would be assigned under a different quantizer). Tombstones of
    # the old tree drop with it.
    from shc_spark.operators.idxcache import begin_staged_build, commit_staged_build

    build_root = begin_staged_build(path)
    spark.createDataFrame(
        [(int(i), [float(x) for x in cent[i]]) for i in range(cent.shape[0])],
        "cid int, centroid array<double>",
    ).repartition(1).write.mode("overwrite").parquet(os.path.join(build_root, "centroids"))

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = _normalize_batch(vecs)
        return pd.Series(np.argmax(M @ cent.T, axis=1).astype("int32"))

    rows = corpus.select(id_col, vec_col).withColumn("cid", assign(F.col(vec_col)))
    if storage == "sq8":
        from shc_spark.operators import quantize

        stats = quantize.dim_stats(corpus, vec_col)
        spark.createDataFrame(
            [(i, s[0], s[1]) for i, s in enumerate(stats)],
            "i int, mn double, mx double",
        ).repartition(1).write.mode("overwrite").parquet(os.path.join(build_root, "quant"))
        rows = rows.select(
            id_col, quantize.code_expr(vec_col, stats).alias("codes"), "cid"
        )
    elif storage == "pq":
        from shc_spark.operators import quantize

        books = quantize.train_pq(corpus, vec_col, id_col, m=pq_m, k=pq_codes)
        spark.createDataFrame(
            [
                (int(j), int(c), [float(x) for x in books[j, c]])
                for j in range(books.shape[0])
                for c in range(books.shape[1])
            ],
            "j int, c int, centroid array<double>",
        ).repartition(1).write.mode("overwrite").parquet(os.path.join(build_root, "pq"))
        rows = rows.select(id_col, _pq_code_udf(books)(F.col(vec_col)).alias("codes"), "cid")
    # repartition on cid BEFORE partitionBy: one file per posting-list
    # partition per generation (every writing task would otherwise
    # emit a file per cid it touches — tasks x centroids files, and
    # each search's directory listing pays for all of them)
    rows.repartition(num_centroids, F.col("cid")).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(os.path.join(build_root, "postings"))
    commit_staged_build(path, build_root)
    return path


def _pq_code_udf(books: np.ndarray):
    """array<int> PQ codes for a vector column under fixed codebooks —
    the same subspace-argmin math as quantize.pq_encode (unit
    normalization first, so codes are scale-invariant like every
    cosine op in the suite)."""
    books = np.asarray(books, dtype=np.float64)
    m, _k, sub = books.shape

    @F.pandas_udf("array<int>")
    def _enc(col: pd.Series) -> pd.Series:
        if col.empty:
            return pd.Series([], dtype=object)
        X = _normalize_batch(col)
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * sub : (j + 1) * sub]
            c2 = (books[j] ** 2).sum(axis=1)
            d = c2[None, :] - 2.0 * (S @ books[j].T)  # + |s|^2 (rank-invariant)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return _enc


def read_ivf_pq(spark, path: str) -> np.ndarray | None:
    """The saved PQ codebooks as an (m, k, sub) array, or None for a
    non-PQ index."""
    import os

    if not os.path.exists(os.path.join(path, "pq", "_SUCCESS")):
        return None
    from shc_spark.operators.idxcache import local_meta_rows

    rows = local_meta_rows(os.path.join(path, "pq"))  # KB-sized: no Spark job
    m = max(r["j"] for r in rows) + 1
    k = max(r["c"] for r in rows) + 1
    sub = len(rows[0]["centroid"])
    books = np.empty((m, k, sub), dtype=np.float64)
    for r in rows:
        books[r["j"], r["c"]] = np.asarray(r["centroid"])
    return books


def read_ivf_quant(spark, path: str) -> list | None:
    """The saved SQ8 codebook as [(mn, mx)] per dimension, or None for
    a float-storage index."""
    import os

    if not os.path.exists(os.path.join(path, "quant", "_SUCCESS")):
        return None
    from shc_spark.operators.idxcache import local_meta_rows

    rows = local_meta_rows(os.path.join(path, "quant"))  # KB-sized: no Spark job
    return [(r["mn"], r["mx"]) for r in sorted(rows, key=lambda r: r["i"])]


def read_ivf_centroids(spark, path: str) -> np.ndarray:
    """The persisted coarse quantizer as a (num_centroids, dim) array,
    ordered by cid."""
    import os

    from shc_spark.operators.idxcache import local_meta_rows

    rows = local_meta_rows(os.path.join(path, "centroids"))  # KB-sized: no Spark job
    return np.stack(
        [np.asarray(r["centroid"]) for r in sorted(rows, key=lambda r: r["cid"])]
    )


def append_to_ivf_index(
    new_rows: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Incremental index maintenance: assign NEW vectors with the
    SAVED quantizer (no retrain — the codebook is the index's
    contract; retraining would silently re-shuffle every existing
    posting) and append them to their cid partitions. The CDC-friendly
    ANN shape: a micro-batch of fresh embeddings costs one assign pass
    + an append write of only the touched partitions. Re-train and
    rebuild (build_ivf_index) when drift makes the old codebook
    unbalanced — that is a policy decision, not this operator's."""
    import os

    spark = new_rows.sparkSession
    cent = read_ivf_centroids(spark, path)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = _normalize_batch(vecs)
        return pd.Series(np.argmax(M @ cent.T, axis=1).astype("int32"))

    rows = new_rows.select(id_col, vec_col).withColumn("cid", assign(F.col(vec_col)))
    stats = read_ivf_quant(spark, path)
    books = read_ivf_pq(spark, path)
    if stats is not None:  # SQ8 index: encode under the SAVED codebook
        from shc_spark.operators import quantize

        rows = rows.select(
            id_col, quantize.code_expr(vec_col, stats).alias("codes"), "cid"
        )
    elif books is not None:  # PQ index: encode under the SAVED books
        rows = rows.select(
            id_col, _pq_code_udf(books)(F.col(vec_col)).alias("codes"), "cid"
        )
    rows.repartition(cent.shape[0], F.col("cid")).write.mode(
        "append"
    ).partitionBy("cid").parquet(os.path.join(path, "postings"))
    return path


def delete_from_ivf_index(spark, path: str, ids) -> str:
    """Mask vectors out of the persisted IVF index without rebuilding
    it (takedown path): ids append to ``tombstones/`` and every later
    search anti-joins its pruned postings against the set before
    scoring. Posting rows stay in place physically (rebuild purges);
    id-level and terminal — re-appending a tombstoned id does not
    resurrect it."""
    import os

    from pyspark.sql import types as T

    from shc_spark.operators.idxcache import index_relation

    if not isinstance(ids, DataFrame):
        id_type = None
        for f in index_relation(spark, path, "postings").schema.fields:
            if f.name != "cid" and not f.dataType.simpleString().startswith("array"):
                id_type = f.dataType
        ids = spark.createDataFrame(
            [(i,) for i in ids], T.StructType([T.StructField("id", id_type)])
        )
    else:
        ids = ids.select(F.col(ids.columns[0]).alias("id"))
    ids.distinct().repartition(1).write.mode("append").parquet(
        os.path.join(path, "tombstones")
    )
    return path


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 4,
    max_queries: int = MAX_QUERY_ROWS,
    rerank_with: DataFrame | None = None,
    rerank_factor: int = 20,
    precollected: "tuple | None" = None,
) -> DataFrame:
    """Search a persisted IVF index (build_ivf_index): probe lists are
    chosen against the tiny centroids table, and the postings scan is
    FILTERED TO THE PROBED cids — a partition-pruned read (check
    PartitionFilters in the plan), so the corpus I/O per query batch
    is nprobe/num_centroids of the index. Identical centroids,
    assignment math, and scoring as ivf_topk, so results match the
    inline operator exactly (float and SQ8 storage).

    PQ-storage indexes score by asymmetric distance against the saved
    codebooks — per query an (m, K) lookup table, m table adds per
    posting row, no vector reconstruction — and report the implied
    cosine (1 - adist/2: codes live on the unit sphere, where
    squared-L2 and cosine are affine twins). Pass ``rerank_with`` (a
    full-precision (id_col, vec_col) table, e.g. the corpus) to get
    the FAISS refine stage: PQ prunes to ``rerank_factor * k``
    survivors per query and only those join back for exact cosines."""
    depth = max(k * rerank_factor, k) if rerank_with is not None else k
    part, q_ids, qm = _ivf_index_scored(
        spark, path, queries, vec_col, id_col, nprobe, max_queries, depth,
        precollected=precollected,
    )
    if rerank_with is None:
        return _topk_window(part, k)
    return _ivf_refine(
        spark, part, q_ids, qm, depth, k, rerank_with, vec_col, id_col
    )


def ivf_index_topk_with_refine(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 4,
    max_queries: int = MAX_QUERY_ROWS,
    rerank_with: DataFrame | None = None,
    rerank_factor: int = 20,
    precollected: "tuple | None" = None,
) -> "tuple[DataFrame, DataFrame]":
    """(approx_topk, refined_topk) from ONE pruned postings scan.

    Callers that need both the raw ADC/SQ8 ranking and the refined
    production ranking (e.g. a recall-floor verdict of the quantized
    tier against full-precision rerank) would otherwise run
    :func:`ivf_index_topk` twice — two query collects, two pruned
    postings reads, two Python scoring passes. This scores once at
    the REFINE depth and derives both outputs from the same scored
    frame. The approx side is value-identical to a standalone
    ``ivf_index_topk(k=k)`` call: per-batch pruning at the deeper
    depth emits a superset of the shallow emission, every row the
    global top-k window could rank survives either way (the
    _ROUND_SLACK argument), and the window ordering is total — so the
    first k rows per query agree exactly. Both returned frames hang
    off the same scored child, and their repartitions by query_id are
    identical subtrees, so the postings scan and the Python pass
    execute once (ReusedExchange — pinned by tests/test_plans.py)."""
    depth = max(k * rerank_factor, k)
    part, q_ids, qm = _ivf_index_scored(
        spark, path, queries, vec_col, id_col, nprobe, max_queries, depth,
        precollected=precollected,
    )
    # r15: pin the depth-ranked frame (bounded: nq x depth rows) so
    # the postings scan + Python scoring pass execute exactly ONCE no
    # matter how many downstream actions consume the two results
    # (separate verdict materializations would otherwise re-evaluate
    # the shared child per action). approx = rank <= k over the SAME
    # total-ordered window a k-deep call would run, so it is
    # row-identical to the standalone result.
    # r16: the pin runs non-adaptive (planutil policy) — the subtree is
    # a statically cid-pruned scan + one Python pass + one window
    # exchange whose only distinct keys are the <= nq query ids, and
    # coalesce(1) collapses the bounded output so downstream consumers
    # don't schedule shuffle.partitions near-empty tasks. Adjudicated
    # at x100 (200k-vector PQ index) with an INTERLEAVED in-process
    # A/B after a first between-process comparison misread phase drift
    # as a 1.6x regression: AQE on/off are equal within noise (mins
    # 4.93s vs 5.15s, wins split 2-2, identical rows), while at sf0.1
    # the wrap cuts the gate 18 -> 12 scheduler jobs.
    from shc_spark.operators.planutil import no_adaptive

    with no_adaptive(spark):
        deep = _topk_window(part, depth).coalesce(1).localCheckpoint(eager=True)
    approx = deep.filter(F.col("rank") <= k)
    refined = _refine_from_pruned(
        spark, deep.drop("rank", "cosine"), q_ids, qm, k, rerank_with,
        vec_col, id_col,
    )
    return approx, refined


def _ivf_index_scored(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    nprobe: int,
    max_queries: int,
    depth: int,
    precollected: "tuple | None" = None,
):
    """The shared body of the persisted-IVF search: probe selection
    against the saved centroids, pruned postings scan, storage-tier
    scoring (float / SQ8 / PQ-ADC) at per-batch depth ``depth``.
    Returns (scored DataFrame, query ids, normalized query matrix)."""
    import os

    cent = read_ivf_centroids(spark, path)
    stats = read_ivf_quant(spark, path)
    books = read_ivf_pq(spark, path)
    dq = (
        None
        if stats is None
        else (
            np.array([s[0] for s in stats], dtype=np.float64),
            np.array([(s[1] - s[0]) / 255.0 for s in stats], dtype=np.float64),
        )
    )
    q_ids, qm = (
        precollected
        if precollected is not None
        else _collect_queries(queries, vec_col, id_col, max_queries)
    )
    probe_map: dict = {}
    lut = None
    if books is not None and len(q_ids):
        # fp32 LUTs (VERDICT r10 #7): halves the broadcast and the ADC
        # gather bandwidth; PQ distances are ~1e-2-grain approximations
        # (the refine stage re-scores exact), so fp32's 1e-7 noise is
        # far below the quantization error it rides on. Built in ONE
        # einsum over (Q, m, K) instead of Q*m python-loop rounds.
        m, K, sub = books.shape
        qr = qm.reshape(len(q_ids), m, 1, sub)  # (Q, m, 1, sub)
        diff = books[None, :, :, :] - qr  # (Q, m, K, sub)
        lut = np.einsum("qmks,qmks->qmk", diff, diff).astype(np.float32)
    if q_ids:
        probe_idx = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
        for qi in range(len(q_ids)):
            for c in probe_idx[qi]:
                probe_map.setdefault(int(c), []).append(qi)
    bc = spark.sparkContext.broadcast((q_ids, qm, probe_map, dq, lut))

    from shc_spark.operators.idxcache import index_relation

    postings = index_relation(spark, path, "postings").filter(
        F.col("cid").isin(*[int(c) for c in probe_map]) if probe_map else F.lit(False)
    )
    if os.path.exists(os.path.join(path, "tombstones", "_SUCCESS")):
        tomb = index_relation(spark, path, "tombstones")
        postings = postings.join(
            tomb.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
    id_type = postings.schema[id_col].dataType.simpleString()
    payload_col = "codes" if (stats is not None or books is not None) else vec_col

    def score(batches):
        qids_, qm_, pmap, dq_, lut_ = bc.value
        if not qids_:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            cid = pdf["__cid"].to_numpy()
            cand = [[] for _ in qids_]
            for i in range(len(ids)):
                for qi in pmap.get(int(cid[i]), ()):
                    cand[qi].append(i)
            if lut_ is not None:
                # PQ postings: ADC — D[q, i] = sum_j lut[q, j, code_ij];
                # report 1 - D/2 (the unit-sphere cosine equivalent)
                C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["__vec"]])
                D = lut_[:, np.arange(C.shape[1]), C].sum(axis=2)
                S = 1.0 - D.T / 2.0
            elif dq_ is not None:
                # SQ8 postings: one affine reconstruction (mn + code *
                # step — the sq8_topk formula) before normalization
                mn_, step_ = dq_
                C = np.stack([np.asarray(c, dtype=np.float64) for c in pdf["__vec"]])
                M = mn_ + C * step_
                n = np.linalg.norm(M, axis=1, keepdims=True)
                n[n == 0] = 1.0
                M = M / n
                S = M @ qm_.T
            else:
                M = _normalize_batch(pdf["__vec"])
                S = M @ qm_.T
            yield from _emit_topk(qids_, ids, S, cand, depth)

    part = postings.select(
        F.col(id_col).alias("__id"),
        F.col(payload_col).alias("__vec"),
        F.col("cid").alias("__cid"),
    ).mapInPandas(score, f"query_id {id_type}, neighbor_id {id_type}, cosine double")
    return part, q_ids, qm


def _ivf_refine(spark, part, q_ids, qm, depth, k, rerank_with, vec_col, id_col):
    """The FAISS refine stage: exact cosine on the depth survivors
    only, then the global top-k window."""
    pruned = _topk_window(part, depth).drop("rank", "cosine")
    return _refine_from_pruned(
        spark, pruned, q_ids, qm, k, rerank_with, vec_col, id_col
    )


def _refine_from_pruned(spark, pruned, q_ids, qm, k, rerank_with, vec_col, id_col):
    """Exact-cosine rerank of an already depth-pruned (query_id,
    neighbor_id) frame against a full-precision vector table."""
    qmap = {qid: qm[i] for i, qid in enumerate(q_ids)}
    bq = spark.sparkContext.broadcast(qmap)

    @F.pandas_udf("double")
    def _cos(qid: pd.Series, vec: pd.Series) -> pd.Series:
        qm_ = bq.value
        if qid.empty:
            return pd.Series([], dtype=float)
        M = _normalize_batch(vec)
        q = np.stack([qm_[x] for x in qid])
        return pd.Series((M * q).sum(axis=1))

    vecs = rerank_with.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__fv")
    )
    scored = pruned.join(vecs, "neighbor_id").withColumn(
        "cosine", _cos("query_id", "__fv")
    ).drop("__fv")
    return _topk_window(scored, k)


def hybrid_search_rrf(
    docs,
    emb,
    terms: list,
    query_vec_id,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rrf_k: int = 60,
    depth: int = 100,
) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and cosine (vector) rankings
    fused with Reciprocal Rank Fusion — the standard recipe for
    retrieval over a training corpus where neither signal alone wins.

    rrf(d) = Σ_rankers 1/(rrf_k + rank_r(d)) over each ranker's
    TOP-``depth`` list (the standard fused-retrieval formulation — a
    doc outside a ranker's top-depth contributes nothing for it).
    Ranks run over ROUNDED scores with id tiebreaks so they are
    reproducible across engines (the same trick the BM25 oracle gate
    relies on).

    Scale shape: BM25's shape is bm25_search's (term-filtered explode,
    broadcast stats); the cosine side broadcasts the single query
    vector. Each ranker's top-depth cut is a DISTRIBUTED TakeOrdered
    (per-partition heaps, no global sort); only the two depth-sized
    lists see a single-partition rank window, so nothing about this
    plan degrades at a billion corpus rows. The cosine expression
    here is the interpreted-HOF form — fine for one query vector; for
    query BATCHES use lsh_topk/ivf_topk's vectorized matmul path."""
    from shc_spark.operators.text import bm25_search

    def _rank_local(top, sort_cols, name):
        # each ranker's list is depth-bounded (≤ `depth` rows): rank by
        # sorting the single coalesced partition and numbering rows in
        # order — identical to row_number over a global window but with
        # no WindowExec (and no "No Partition Defined" warning);
        # monotonically_increasing_id is consecutive from 0 within one
        # partition, and the projection runs after the sort
        return (
            top.coalesce(1)
            .sortWithinPartitions(*sort_cols)
            .select(
                "id",
                (F.monotonically_increasing_id() + 1).cast("int").alias(name),
            )
        )

    bm = bm25_search(docs, terms, text_col, doc_id_col, k=depth)
    bm_r = _rank_local(bm, [F.desc("bm25"), F.asc("id")], "r_bm")

    q = emb.filter(F.col(vec_id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    e, v = F.col(vec_col), F.col("qv")
    dot = F.aggregate(F.zip_with(e, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    sq = lambda c: F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = (
        emb.join(F.broadcast(q))
        .select(
            F.col(vec_id_col).alias("id"),
            F.round(dot / F.sqrt(sq(e) * sq(v)), 6).alias("cos"),
        )
    )
    cos_top = cos.orderBy(F.desc("cos"), F.asc("id")).limit(depth)  # TakeOrdered
    cos_r = _rank_local(cos_top, [F.desc("cos"), F.asc("id")], "r_cos")

    fused = (
        bm_r.join(cos_r, "id", "full_outer")
        .select(
            F.col("id").alias(doc_id_col),
            F.round(
                F.coalesce(1.0 / (rrf_k + F.col("r_bm")), F.lit(0.0))
                + F.coalesce(1.0 / (rrf_k + F.col("r_cos")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc(doc_id_col)).limit(k)


def hybrid_index_rrf(
    spark,
    text_path: str,
    ivf_path: str,
    terms: list,
    query_vec,
    k: int = 10,
    rrf_k: int = 60,
    depth: int = 100,
    nprobe: int = 4,
) -> DataFrame:
    """Hybrid retrieval SERVED FROM PERSISTED INDEXES: the lexical
    ranking comes from the BM25 inverted index (textindex.py, reads
    only the |Q| terms' posting buckets) and the vector ranking from
    the IVF index (reads only the probed cid partitions) — the corpus
    text and embeddings are never touched at query time, which is the
    whole point of a serving stack. Fusion is the same RRF formula as
    the inline :func:`hybrid_search_rrf`, over each ranker's
    top-``depth`` list with reproducible (rounded score, id) ranks.

    ``query_vec`` is the single query embedding as a plain list — the
    one-request serving shape. With ``nprobe`` >= num_centroids the
    vector ranking is exhaustive-exact and the whole result is
    SQL-replayable (the driver gate pins exactly that)."""
    from shc_spark.operators.textindex import text_index_topk

    bm = text_index_topk(spark, text_path, terms, k=depth)
    bm_r = (
        bm.coalesce(1)
        .sortWithinPartitions(F.desc("bm25"), F.asc("id"))
        .select(
            "id", (F.monotonically_increasing_id() + 1).cast("int").alias("r_bm")
        )
    )
    # query id -1: the top-k operators exclude self-matches by id
    # equality, so a placeholder id that collides with a corpus id
    # would silently drop that corpus vector from the ranking
    qdf = spark.createDataFrame(
        [(-1, [float(x) for x in query_vec])], "vec_id long, embedding array<double>"
    )
    vec = ivf_index_topk(spark, ivf_path, qdf, k=depth, nprobe=nprobe)
    vec_r = vec.select(
        F.col("neighbor_id").alias("id"), F.col("rank").alias("r_cos")
    )
    fused = bm_r.join(vec_r, "id", "full_outer").select(
        F.col("id").alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (rrf_k + F.col("r_bm")), F.lit(0.0))
            + F.coalesce(1.0 / (rrf_k + F.col("r_cos")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(k)


def hybrid_index_rrf_batch(
    spark,
    text_path: str,
    ivf_path: str,
    queries: dict,
    k: int = 10,
    rrf_k: int = 60,
    depth: int = 100,
    nprobe: int = 4,
) -> DataFrame:
    """Batched hybrid serving: ``queries`` maps query_id -> (terms,
    query_vec). The lexical side answers ALL queries in one pruned
    pass (textindex.text_index_topk_batch); the vector side probes the
    IVF index with the whole query-vector batch at once
    (ivf_index_topk is batch-native); RRF fuses per query. Per-query
    results equal :func:`hybrid_index_rrf` run one by one — pinned by
    test — at a fraction of the round-trips: the 1000-query serving
    shape. Output: (query_id, doc_id, rrf, rank)."""
    from shc_spark.operators.textindex import text_index_topk_batch

    from pyspark.sql import Window

    bm = text_index_topk_batch(
        spark, text_path, {q: t for q, (t, _v) in queries.items()}, k=depth
    ).select("query_id", "id", F.col("rank").alias("r_bm"))
    # vector ids are negative ordinals so a corpus id can never
    # self-exclude (see hybrid_index_rrf); map back to query_id after
    qorder = sorted(queries)
    qdf = spark.createDataFrame(
        [(-(i + 1), [float(x) for x in queries[q][1]]) for i, q in enumerate(qorder)],
        "vec_id long, embedding array<double>",
    )
    vmap = F.create_map(
        *[x for i, q in enumerate(qorder) for x in (F.lit(-(i + 1)), F.lit(q))]
    )
    vec = (
        ivf_index_topk(spark, ivf_path, qdf, k=depth, nprobe=nprobe)
        .select(
            vmap[F.col("query_id")].alias("query_id"),
            F.col("neighbor_id").alias("id"),
            F.col("rank").alias("r_cos"),
        )
    )
    fused = bm.join(vec, ["query_id", "id"], "full_outer").select(
        "query_id",
        F.col("id").alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (rrf_k + F.col("r_bm")), F.lit(0.0))
            + F.coalesce(1.0 / (rrf_k + F.col("r_cos")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf", "rank")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    num_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    num_codes: int = 16,
    rerank_factor: int = 20,
    seed: int = 11,
    max_queries: int = MAX_QUERY_ROWS,
    precollected: "tuple | None" = None,
) -> DataFrame:
    """The full billion-scale ANN recipe in one operator — IVF routing
    x PQ asymmetric-distance scoring x exact re-rank (the FAISS
    IVFPQ + refine shape, built from the suite's own pieces):

    1. a coarse spherical-k-means quantizer routes each query to its
       ``nprobe`` nearest posting lists, so only ~nprobe/num_centroids
       of the corpus is SCORED at all;
    2. rows in probed cells are scored by PQ asymmetric distance — a
       per-query (m, K) lookup table, m adds per row, no full-precision
       math on the corpus side;
    3. the ``rerank_factor * k`` PQ survivors per query (and ONLY
       those) join back to their vectors for exact cosine ordering.

    Output: (query_id, neighbor_id, cosine 4dp, rank) — the same
    contract as every other *_topk, so recall pins compare directly
    against cosine_topk. Approximate on two axes (routing can miss a
    cell, PQ can misrank within the cut); rerank_factor buys back the
    second. Corpus never shuffles; stage-3 traffic is nq * R * k rows."""
    from shc_spark.operators import quantize

    cent = _train_centroids(corpus, vec_col, num_centroids, dim, seed)
    books = quantize.train_pq(corpus, vec_col, id_col, m=m, k=num_codes)
    q_ids, qm = (
        precollected
        if precollected is not None
        else _collect_queries(queries, vec_col, id_col, max_queries)
    )
    probe_map: dict = {}
    lut = np.zeros((len(q_ids), m, num_codes))
    sub = dim // m
    if q_ids:
        probe_idx = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
        for qi in range(len(q_ids)):
            for c in probe_idx[qi]:
                probe_map.setdefault(int(c), []).append(qi)
            for j in range(m):
                diff = books[j] - qm[qi, j * sub : (j + 1) * sub][None, :]
                lut[qi, j] = (diff**2).sum(axis=1)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, probe_map, lut, books))
    depth = max(k * rerank_factor, k)

    def score(batches):
        qids_, pmap, lut_, books_ = bc.value
        if not qids_:
            return
        jidx = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            M = _normalize_batch(pdf["__vec"])
            cid = np.argmax(M @ cent.T, axis=1)
            cand = [[] for _ in qids_]
            for i in range(len(ids)):
                for qi in pmap.get(int(cid[i]), ()):
                    cand[qi].append(i)
            # on-the-fly PQ encode of the batch (production stores the
            # codes; the math is identical): argmin subspace centroid
            C = np.empty((len(ids), m), dtype=np.int64)
            for j in range(m):
                S_ = M[:, j * sub : (j + 1) * sub]
                d = ((S_[:, None, :] - books_[j][None, :, :]) ** 2).sum(axis=2)
                C[:, j] = d.argmin(axis=1)
            D = lut_[:, jidx, C].sum(axis=2)  # (nq, batch)
            # negative adist as the pruning score: _emit_topk keeps the
            # per-batch top-`depth` candidates per query
            yield from _emit_topk(q_ids, ids, -D.T, cand, depth)

    id_type = corpus.schema[id_col].dataType.simpleString()
    part = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
    ).mapInPandas(score, f"query_id {id_type}, neighbor_id {id_type}, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    pruned = (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= depth)
        .drop("rank", "cosine")
    )
    # exact re-rank on the survivors only
    qmap = {qid: qm[i] for i, qid in enumerate(q_ids)}
    bq = spark.sparkContext.broadcast(qmap)

    @F.pandas_udf("double")
    def _cos(qid: pd.Series, vec: pd.Series) -> pd.Series:
        qm_ = bq.value
        if qid.empty:
            return pd.Series([], dtype=float)
        M = _normalize_batch(vec)
        q = np.stack([qm_[x] for x in qid])
        return pd.Series((M * q).sum(axis=1))

    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__fv")
    )
    scored = pruned.join(vecs, "neighbor_id").withColumn(
        "cosine", _cos("query_id", "__fv")
    ).drop("__fv")
    return _topk_window(scored, k)


def hard_negative_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 5,
    max_queries: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the k most-similar corpus vectors with a DIFFERENT label — similar
    enough to be hard, excluded from the positive class by the label.

    Same scale shape as cosine_topk (query side broadcast, corpus
    scanned once in Arrow batches, distributed per-batch prune to a
    provable superset of the global top-k): the label exclusion is a
    per-query candidate mask inside the batch, not a join. NULL
    labels follow SQL three-valued semantics (``c.label != q.label``
    is NULL, not true): a NULL-labeled corpus row is never a
    negative, a NULL-labeled query mines nothing."""
    spark = corpus.sparkSession
    rows = _bounded_query_rows(queries, (id_col, vec_col, label_col), max_queries)
    q_ids = [r[0] for r in rows]
    if rows:
        qm = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
        n = np.linalg.norm(qm, axis=1, keepdims=True)
        n[n == 0] = 1.0
        qm = qm / n
        q_labels = np.asarray([r[2] for r in rows], dtype=object)
    else:
        qm = np.zeros((0, 1), dtype=np.float64)
        q_labels = np.asarray([], dtype=object)
    bq = spark.sparkContext.broadcast((q_ids, qm, q_labels))

    def score(batches):
        ids_q, q_mat, labs_q = bq.value
        if not ids_q:
            return
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["__id"].to_numpy()
            labs = pdf["__lab"].to_numpy()
            notnull = pd.notna(labs)
            S = _normalize_batch(pdf["__vec"]) @ q_mat.T
            cand = [
                np.nonzero((labs != labs_q[j]) & notnull)[0]
                if pd.notna(labs_q[j])
                else np.array([], dtype=np.int64)
                for j in range(len(ids_q))
            ]
            yield from _emit_topk(ids_q, ids, S, cand, k)

    id_type = corpus.schema[id_col].dataType.simpleString()
    part = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.col(label_col).alias("__lab"),
    ).mapInPandas(score, f"query_id {id_type}, neighbor_id {id_type}, cosine double")
    return _topk_window(part, k)


def minor_compact_ivf_index(spark, path: str, threshold: int = 2) -> str:
    """MINOR compaction: fold only the cid partitions fragmented by
    appends back to one posting file each; cold lists untouched,
    tombstones stay in force (no purge — :func:`compact_ivf_index`
    does that). Cost = mass in fragmented lists; cheap only for
    bucket-sparse appends (see idxcache.compact_fragmented_partitions
    for the regime analysis)."""
    import os

    from shc_spark.operators.idxcache import compact_fragmented_partitions

    compact_fragmented_partitions(
        spark, os.path.join(path, "postings"), "cid", threshold=threshold
    )
    return path


def compact_ivf_index(spark, path: str) -> str:
    """Major compaction for the persisted IVF index: fold append
    generations back to one posting file per cid, physically purge
    tombstone-masked vectors, clear the tombstone set (a purged id can
    then be re-admitted by a later append). Derived-data rewrite:
    replace-on-success — the new postings subtree swaps in (two
    renames via .bak, idxcache.replace_subtree) only after its
    _SUCCESS marker exists; a crash at any point leaves a recoverable
    postings tree on disk. Tombstones are snapshotted at entry — only
    the snapshot rows are purged and only those files deleted, so a
    concurrent cross-process tombstone append keeps masking until the
    next compaction."""
    import os
    import shutil

    from shc_spark.operators.idxcache import (
        drop_tombstone_snapshot,
        replace_subtree,
        tombstone_snapshot,
    )

    tomb_path = os.path.join(path, "tombstones")
    cur = spark.read.parquet(os.path.join(path, "postings"))
    snapshot = tombstone_snapshot(tomb_path)
    if snapshot:
        id_col = next(
            f.name
            for f in cur.schema.fields
            if f.name != "cid" and not f.dataType.simpleString().startswith("array")
        )
        tomb = spark.read.parquet(*snapshot).select(F.col("id").alias(id_col))
        cur = cur.join(tomb, id_col, "left_anti")
    n_cids = read_ivf_centroids(spark, path).shape[0]
    tmp = os.path.join(path, "postings.compact")
    shutil.rmtree(tmp, ignore_errors=True)
    cur.repartition(n_cids, F.col("cid")).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(tmp)
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        raise RuntimeError("compaction write of postings did not commit")
    replace_subtree(os.path.join(path, "postings"), tmp)
    drop_tombstone_snapshot(tomb_path, snapshot)
    return path
