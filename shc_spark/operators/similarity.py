"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force top-k — exact baseline. The query side is
  broadcast (queries are few), the corpus side streams: no shuffle of
  the corpus, one window per query for the top-k cut.
- lsh_topk: random-hyperplane LSH bucketing — the 100 TB path. Corpus
  vectors hash into 2^num_planes buckets; a query only compares
  against candidates sharing a bucket (multi-probe: exact bucket plus
  all 1-bit-flip neighbors to recover boundary losses).
- ivf_topk: IVF-style coarse quantization: k-means-free variant using
  seeded random centroids (deterministic); probe the nprobe nearest
  centroids' posting lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalized(df: DataFrame, vec_col: str, id_col: str, out_vec: str = "nv") -> DataFrame:
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    return df.select(
        F.col(id_col).alias("id"), F.transform(F.col(vec_col), lambda x: x / norm).alias(out_vec)
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of corpus for each query vector.

    Output: query_id, neighbor_id, cosine (4dp), rank. Ties broken by
    neighbor id -> fully deterministic. Self-matches excluded.
    """
    q = _normalized(queries, vec_col, id_col).select(
        F.col("id").alias("query_id"), F.col("nv").alias("qv")
    )
    c = _normalized(corpus, vec_col, id_col).select(
        F.col("id").alias("neighbor_id"), F.col("nv").alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("qv"), F.col("cv")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_table_udf(dim: int, num_tables: int, planes_per_table: int, seed: int = 7):
    """array<int> of bucket ids, one per hash table. Multi-table LSH is
    the standard recall lever when neighbors are weakly separated
    (single-table sign-LSH recall collapses as cosine -> 0.5):
    P[collide in >=1 of L tables] = 1 - (1 - p^k)^L."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables * planes_per_table, dim))
    weights = 1 << np.arange(planes_per_table)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (M @ planes.T) > 0  # (batch, L*k)
        signs = signs.reshape(len(M), num_tables, planes_per_table)
        vals = (signs * weights).sum(axis=2).astype(np.int32)  # (batch, L)
        return pd.Series(list(vals))

    return buckets


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    num_tables: int = 8,
    planes_per_table: int = 6,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: a query compares
    only against corpus rows sharing a bucket in at least one of
    ``num_tables`` tables (plus 1-bit-flip probes per table). The
    corpus hashes once; per-query candidates ~ |corpus| * L * probes /
    2^k — at 100 TB the candidate join shuffles bucket ids, never the
    vectors of non-candidates."""
    buckets = lsh_table_udf(dim, num_tables, planes_per_table)
    c = (
        _normalized(corpus, vec_col, id_col)
        .withColumn("bkts", buckets(F.col("nv")))
        .select(
            "id", "nv", F.posexplode("bkts").alias("tbl", "bkt")
        )
    )
    q = _normalized(queries, vec_col, id_col).withColumn("bkts", buckets(F.col("nv")))
    q = q.select(
        F.col("id").alias("query_id"), F.col("nv").alias("qv"),
        F.posexplode("bkts").alias("tbl", "bkt0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bkt0"),
            *[F.col("bkt0").bitwiseXOR(F.lit(1 << i)) for i in range(planes_per_table)],
        )
    else:
        probes = F.array(F.col("bkt0"))
    q = q.select("query_id", "qv", "tbl", F.explode(probes).alias("bkt"))
    scored = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(_dot(F.col("qv"), F.col("nv")), 4).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


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
) -> DataFrame:
    """IVF-style ANN with deterministic random centroids: corpus rows
    attach to their nearest centroid (posting lists); each query scans
    only its nprobe nearest lists."""
    rng = np.random.RandomState(seed)
    cent = rng.standard_normal((num_centroids, dim))
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    def assign_udf(top_n: int):
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def assign(vecs: pd.Series) -> pd.Series:
            M = np.stack(vecs.to_numpy())
            sims = M @ cent.T
            idx = np.argsort(-sims, axis=1)[:, :top_n]
            return pd.Series(list(idx.astype(np.int32)))

        return assign

    c = _normalized(corpus, vec_col, id_col).withColumn(
        "cid", F.element_at(assign_udf(1)(F.col("nv")), 1)
    )
    q = _normalized(queries, vec_col, id_col).select(
        F.col("id").alias("query_id"),
        F.col("nv").alias("qv"),
        F.explode(assign_udf(nprobe)(F.col("nv"))).alias("cid"),
    )
    scored = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(_dot(F.col("qv"), F.col("nv")), 4).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
