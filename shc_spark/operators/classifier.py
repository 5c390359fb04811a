"""Quality classifier: logistic regression over hashed bag-of-ngrams
features — the fastText-style document scorer every curation pipeline
trains ("looks like reference text?" / "looks like spam?") before
filtering a crawl.

Scale design (100 TB lens):
- features are HASHED (pd.util.hash_array of unigrams + bigrams mod
  ``dim``): no vocabulary pass, no dictionary to ship — any executor
  featurizes any document independently;
- training is full-batch gradient descent where each iteration is ONE
  mapInPandas pass emitting a single (dim+2)-vector partial per
  partition (gradient sum, loss sum, count); the driver folds the
  partials and steps. Corpus never shuffles, never leaves the
  executors; driver traffic per iteration = num_partitions x dim
  floats. Deterministic: fixed iterations, zero-init weights,
  partition-order-independent float sums are avoided by folding in
  partition order (sorted pid).
- scoring is map-only (broadcast weights, Arrow-batched sigmoid).

The distributed gradient is pinned EXACTLY equal to a single-machine
numpy implementation of the same math (tests) — the partial-sum
decomposition is the only distributed ingredient, so equality there
proves the training loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_features_csr(texts, dim: int):
    """(flat_idx, flat_val, indptr) — CSR over docs of L2-normalized
    hashed unigram+bigram counts. Deterministic (pandas fixed-key
    siphash). ONE hash_array call per chunk (r12: the per-doc
    hash_array call was the training/scoring hot spot — string
    hashing now batches across the whole Arrow chunk)."""
    grams: list = []
    lens = []
    for t in texts:
        toks = [w for w in (t.split(" ") if t else []) if w]
        g = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        grams.extend(g)
        lens.append(len(g))
    nd = len(lens)
    indptr = np.zeros(nd + 1, dtype=np.int64)
    if not grams:
        return np.empty(0, np.int64), np.empty(0, np.float64), indptr
    h = pd.util.hash_array(np.array(grams, dtype=object)).view(np.int64) % dim
    bounds = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    idx_parts, val_parts = [], []
    total = 0
    for i in range(nd):
        seg = h[bounds[i]: bounds[i + 1]]
        if len(seg):
            idx, cnt = np.unique(seg, return_counts=True)
            v = cnt.astype(np.float64)
            v /= np.linalg.norm(v)
            idx_parts.append(idx)
            val_parts.append(v)
            total += len(idx)
        indptr[i + 1] = total
    flat_idx = np.concatenate(idx_parts) if idx_parts else np.empty(0, np.int64)
    flat_val = np.concatenate(val_parts) if val_parts else np.empty(0, np.float64)
    return flat_idx, flat_val, indptr


def _hash_features(texts, dim: int) -> "tuple[list[np.ndarray], list[np.ndarray]]":
    """Per-doc (indices, values) view of :func:`_hash_features_csr`."""
    flat_idx, flat_val, indptr = _hash_features_csr(texts, dim)
    idx_out = [flat_idx[indptr[i]: indptr[i + 1]] for i in range(len(indptr) - 1)]
    val_out = [flat_val[indptr[i]: indptr[i + 1]] for i in range(len(indptr) - 1)]
    return idx_out, val_out


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _seg_dot(flat_val, flat_idx, w, indptr):
    """Per-doc sparse dot products v_i . w[idx_i] over the CSR chunk —
    np.add.reduceat over the contribution vector; empty docs get 0."""
    nd = len(indptr) - 1
    z = np.zeros(nd, dtype=np.float64)
    if len(flat_idx) == 0:
        return z
    seg = np.diff(indptr)
    nz = seg > 0
    contrib = flat_val * w[flat_idx]
    z[nz] = np.add.reduceat(contrib, indptr[:-1][nz])
    return z


def _grad_partial(texts, labels, w, b, dim):
    """(grad_w[dim], grad_b, loss_sum, n) over one chunk — shared by
    the executors and the numpy reference implementation (tests pin
    the distributed fold equal to running this once over all rows).
    Fully vectorized (r12): per-doc z via segment reduceat, gradient
    scatter via bincount — no Python loop over documents."""
    flat_idx, flat_val, indptr = _hash_features_csr(texts, dim)
    y = np.asarray(labels, dtype=np.float64)
    z = _seg_dot(flat_val, flat_idx, w, indptr) + b
    p = _sigmoid(z)
    err = p - y
    if len(flat_idx):
        seg = np.diff(indptr)
        gw = np.bincount(
            flat_idx, weights=np.repeat(err, seg) * flat_val, minlength=dim
        ).astype(np.float64)
    else:
        gw = np.zeros(dim, dtype=np.float64)
    gb = float(err.sum())
    eps = 1e-12
    loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
    return gw, gb, loss, len(y)


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 2**16,
    iters: int = 20,
    lr: float = 2.0,
) -> "tuple[np.ndarray, float, list[float]]":
    """(weights[dim], bias, per-iteration mean loss). Full-batch GD,
    deterministic. ``label_col`` must be 0/1 (int or bool)."""
    spark = df.sparkSession
    src = df.select(
        F.col(text_col).alias("__text"),
        F.col(label_col).cast("int").alias("__y"),
    ).where(F.col("__text").isNotNull())
    src = src.persist()
    try:
        w = np.zeros(dim, dtype=np.float64)
        b = 0.0
        losses: list[float] = []
        for _ in range(iters):
            bw = spark.sparkContext.broadcast(w)
            bb = b

            def partials(batches):
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                gw = np.zeros(dim, dtype=np.float64)
                gb = 0.0
                loss = 0.0
                n = 0
                for pdf in batches:
                    if not len(pdf):
                        continue
                    pgw, pgb, pl, pn = _grad_partial(
                        pdf["__text"], pdf["__y"], bw.value, bb, dim
                    )
                    gw += pgw
                    gb += pgb
                    loss += pl
                    n += pn
                if n:
                    yield pd.DataFrame(
                        {
                            "pid": [pid],
                            "gw": [gw.tolist()],
                            "gb": [gb],
                            "loss": [loss],
                            "n": [n],
                        }
                    )

            rows = src.mapInPandas(
                partials, "pid int, gw array<double>, gb double, loss double, n long"
            ).collect()  # <= one (dim+3)-vector per partition
            bw.unpersist()
            if not rows:
                raise ValueError("no training rows")
            rows.sort(key=lambda r: r["pid"])  # deterministic fold order
            gw = np.zeros(dim, dtype=np.float64)
            gb = 0.0
            loss = 0.0
            n = 0
            for r in rows:
                gw += np.asarray(r["gw"])
                gb += r["gb"]
                loss += r["loss"]
                n += r["n"]
            w = w - lr * gw / n
            b = b - lr * gb / n
            losses.append(loss / n)
        return w, b, losses
    finally:
        src.unpersist()


def score_texts(
    df: DataFrame,
    weights: "np.ndarray",
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_score",
    round_to: int = 6,
) -> DataFrame:
    """(id, score in [0,1]) — map-only broadcast-weights scoring."""
    dim = len(weights)
    spark = df.sparkSession
    bw = spark.sparkContext.broadcast(np.asarray(weights, dtype=np.float64))
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches):
        w = bw.value
        for pdf in batches:
            if not len(pdf):
                continue
            flat_idx, flat_val, indptr = _hash_features_csr(pdf["__text"], dim)
            z = _seg_dot(flat_val, flat_idx, w, indptr) + bias
            yield pd.DataFrame(
                {
                    "id": pdf["__id"].to_numpy(),
                    out_col: np.round(_sigmoid(z), round_to),
                }
            )

    out = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    ).mapInPandas(run, f"id {id_type}, {out_col} double")
    return out.withColumnRenamed("id", id_col)
