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
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, proj array<double>"
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
        run, schema="id long, proj array<double>"
    )
    return out.withColumnRenamed("id", id_col)
