"""Distributed k-means over embedding columns + semantic dedup.

The reference has no clustering (it is a storage connector); these are
the LLM-pipeline extensions the build brief asks for on top of the
`embeddings` table (cf. SURVEY.md §7.1 M6).

Design for scale (100 TB lens):
- Centroids live on the driver: k x dim float64 — a few KB — and are
  shipped to executors inside the Arrow-batched closure (an implicit
  broadcast of a tiny array).
- Each Lloyd iteration is ONE ``mapInPandas`` pass that emits at most
  k partial (count, sum-vector) rows PER PARTITION (map-side combine).
  The driver collects <= k * num_partitions tiny rows and reduces them
  with numpy — bounded by the partition count, independent of corpus
  size. The corpus itself never shuffles and is scanned exactly
  max_iter times (cache the input DataFrame for small corpora).
- Assignment is a broadcast argmin inside a vectorized batch matmul:
  |batch| x k distances per Arrow batch, no shuffle.

Semantic dedup = cluster, then keep one representative per cluster
(nearest to its centroid, ties by id): the only shuffle in the whole
pipeline is the final k-group reduction.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stack(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64, copy=False)


def seed_centroids(df: DataFrame, vec_col: str, id_col: str, k: int) -> np.ndarray:
    """Deterministic seeds: the k vectors with the smallest ids.
    Driver-side materialization is exactly k rows — bounded by
    construction (same pattern as similarity._train_centroids)."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(rows)}")
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def _sq_dists(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """|batch| x k squared Euclidean distances via one matmul:
    ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2."""
    x2 = (mat * mat).sum(axis=1, keepdims=True)
    c2 = (cents * cents).sum(axis=1)
    return x2 - 2.0 * (mat @ cents.T) + c2


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iter: int = 5,
    tol: float = 1e-9,
) -> np.ndarray:
    """Lloyd's algorithm; returns the k x dim centroid matrix.

    Each iteration scans the corpus once and moves <= k rows per
    partition to the driver (partial sums) — no shuffle at any scale.
    """
    cents = seed_centroids(df, vec_col, id_col, k)
    vecs = df.select(vec_col)
    schema = "cluster long, cnt long, sums array<double>"
    for _ in range(max_iter):
        frozen = cents.copy()

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            counts = np.zeros(len(frozen), dtype=np.int64)
            sums = np.zeros_like(frozen)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = _stack(pdf.iloc[:, 0])
                assign = _sq_dists(mat, frozen).argmin(axis=1)
                np.add.at(counts, assign, 1)
                np.add.at(sums, assign, mat)
            live = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {"cluster": live, "cnt": counts[live], "sums": list(sums[live])}
            )

        rows = vecs.mapInPandas(partials, schema).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        for r in rows:
            counts[r["cluster"]] += r["cnt"]
            sums[r["cluster"]] += np.asarray(r["sums"])
        nxt = cents.copy()  # empty clusters keep their previous centroid
        live = counts > 0
        nxt[live] = sums[live] / counts[live, None]
        shift = float(((nxt - cents) ** 2).sum())
        cents = nxt
        if shift <= tol:
            break
    return cents


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    dist_col: str | None = None,
) -> DataFrame:
    """Adds the argmin-centroid column (and optionally the squared
    distance). Vectorized batch matmul, no shuffle."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("struct<cluster: long, dist: double>")
    def _assign(col: pd.Series) -> pd.DataFrame:
        if col.empty:
            return pd.DataFrame({"cluster": [], "dist": []})
        mat = _stack(col)
        d = _sq_dists(mat, cents)
        a = d.argmin(axis=1)
        return pd.DataFrame({"cluster": a, "dist": d[np.arange(len(a)), a]})

    tmp = df.withColumn("__a", _assign(F.col(vec_col)))
    out = tmp.withColumn(out_col, F.col("__a.cluster"))
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("__a.dist"))
    return out.drop("__a")


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 32,
    max_iter: int = 5,
    centroids=None,
) -> DataFrame:
    """Corpus-level semantic dedup: k-means the embeddings, keep ONE
    representative per cluster — the member nearest its centroid, ties
    broken by smallest id. Output: (cluster, id, members) sorted-free.

    ``centroids`` accepts a pre-trained (k, d) array (e.g. fitted on a
    sample, or reused across corpus snapshots) and skips the fit —
    then the whole operator is a single assign pass + one shuffle.

    The only shuffle is the k-group min reduction (min_by on a struct,
    map-side combinable)."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_fit(df, vec_col, id_col, k=k, max_iter=max_iter)
    )
    assigned = kmeans_assign(df, cents, vec_col, "cluster", "__dist")
    best = F.min(F.struct(F.col("__dist"), F.col(id_col).alias("id"))).alias("b")
    return (
        assigned.groupBy("cluster")
        .agg(best, F.count(F.lit(1)).alias("members"))
        .select("cluster", F.col("b.id").alias(id_col), "members")
    )
