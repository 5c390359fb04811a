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


def _hash_features(texts, dim: int) -> "tuple[list[np.ndarray], list[np.ndarray]]":
    """Per-doc (indices, values): L2-normalized hashed unigram+bigram
    counts. Deterministic (pandas fixed-key siphash)."""
    idx_out, val_out = [], []
    for t in texts:
        toks = [w for w in (t.split(" ") if t else []) if w]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            idx_out.append(np.empty(0, dtype=np.int64))
            val_out.append(np.empty(0, dtype=np.float64))
            continue
        h = (
            pd.util.hash_array(np.array(grams, dtype=object)).view(np.int64)
            % dim
        )
        idx, cnt = np.unique(h, return_counts=True)
        v = cnt.astype(np.float64)
        v /= np.linalg.norm(v)
        idx_out.append(idx)
        val_out.append(v)
    return idx_out, val_out


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _grad_partial(texts, labels, w, b, dim):
    """(grad_w[dim], grad_b, loss_sum, n) over one chunk — shared by
    the executors and the numpy reference implementation (tests pin
    the distributed fold equal to running this once over all rows)."""
    gw = np.zeros(dim, dtype=np.float64)
    gb = 0.0
    loss = 0.0
    n = 0
    idxs, vals = _hash_features(texts, dim)
    for idx, v, y in zip(idxs, vals, labels):
        z = float(v @ w[idx]) + b if len(idx) else b
        p = float(_sigmoid(np.array([z]))[0])
        err = p - float(y)
        if len(idx):
            gw[idx] += err * v
        gb += err
        eps = 1e-12
        loss += -(float(y) * np.log(p + eps) + (1 - float(y)) * np.log(1 - p + eps))
        n += 1
    return gw, gb, loss, n


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
            idxs, vals = _hash_features(pdf["__text"], dim)
            z = np.array(
                [
                    (float(v @ w[idx]) if len(idx) else 0.0) + bias
                    for idx, v in zip(idxs, vals)
                ]
            )
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
