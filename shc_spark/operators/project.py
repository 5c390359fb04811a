"""Random-projection dimensionality reduction (Johnson-Lindenstrauss)
for embedding columns: d -> k dims with pairwise distances preserved
within (1 +- eps) w.h.p. — the standard pre-step before quantization /
ANN when the raw dimension is wasteful.

The projection matrix is NOT drawn from an RNG: entry (i, j) derives
from md5(f"{seed}:{i}:{j}") mapped to a uniform in [-0.5, 0.5) and
scaled by sqrt(12/k) (unit-variance JL scaling). md5 is available in
both engines, so the ENTIRE projection — matrix and matmul — is
reproducible across engines, runs, and retries, and the gate is
value-exact instead of rows-only (a seeded-numpy matrix could never
be recomputed by a SQL oracle).

Scale shape: the k x d matrix is a broadcast numpy array; projection
is one Arrow-batched matmul per batch inside mapInPandas — map-only,
embeddings never shuffle.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def jl_matrix(out_dim: int, in_dim: int, seed: int = 0) -> np.ndarray:
    """(out_dim, in_dim) float64 projection matrix; entry (i, j) =
    (md5("{seed}:{i}:{j}")'s first 8 hex chars / 16^8 - 0.5) *
    sqrt(12 / out_dim)."""
    scale = math.sqrt(12.0 / out_dim)
    m = np.empty((out_dim, in_dim), dtype=np.float64)
    for i in range(out_dim):
        for j in range(in_dim):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:8]
            m[i, j] = (int(h, 16) / float(1 << 32) - 0.5) * scale
    return m


def project_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dim: int = 16,
    seed: int = 0,
    round_to: int = 6,
) -> DataFrame:
    """(id, proj: array<double>[out_dim]) — deterministic JL
    projection, rounded so the output is engine-neutral."""
    id_type = df.schema[id_col].dataType.simpleString()
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, proj array<double>"
        )
    in_dim = len(first[0])
    mat = jl_matrix(out_dim, in_dim, seed)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = np.round(vecs @ mat.T, round_to)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "proj": list(proj)}
            )

    out = df.select(id_col, vec_col).mapInPandas(
        run, schema=f"id {id_type}, proj array<double>"
    )
    return out.withColumnRenamed("id", id_col)


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 16
) -> "tuple[np.ndarray, np.ndarray]":
    """(mean[d], components[k, d]) of the corpus covariance — the
    other standard embedding pre-step (variance-optimal where JL is
    oblivious). Covariance is assembled DISTRIBUTED: each partition
    emits one (count, sum[d], outer-product-sum[d, d]) partial via
    mapInPandas, the driver folds the tiny d x d partials and runs
    eigh — the corpus itself never moves. Deterministic: partial sums
    are folded in partition order and eigh is deterministic; a sign
    convention (largest-|.| entry positive) fixes the eigenvector
    sign ambiguity."""
    first = df.select(vec_col).first()
    d = len(first[0])

    def partials(batches):
        n, s, ss = 0, np.zeros(d), np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += len(v)
            s += v.sum(axis=0)
            ss += v.T @ v
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, ss array<double>"
    ).collect()  # <= one tiny row per partition
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comp = vecs[:, ::-1][:, :k].T  # top-k rows
    for i in range(comp.shape[0]):  # sign convention
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return mean, comp


def pca_transform(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """(id, proj) — center + project with the broadcast PCA basis;
    map-only, embeddings never shuffle."""

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean
            proj = np.round(v @ components.T, round_to)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "proj": list(proj)})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        run, schema=f"id {id_type}, proj array<double>"
    ).withColumnRenamed("id", id_col)
