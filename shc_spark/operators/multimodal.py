"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs.

The Spark-side plumbing — schema, partition-preserving mapInPandas,
Arrow batch shapes, UDF signatures — is real and tested; the actual
codec calls are STUBBED (this container has no image/audio libraries):
``decode_image`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic fake decoder (seeded by payload bytes)
produces stable feature values so pipelines are testable end-to-end.

At 100 TB: payloads stay in executor memory only for the duration of
one Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds peak memory: bytes_per_row * batch_rows); feature extraction is
a map-only stage — no shuffle touches raw bytes, and downstream
aggregation shuffles only the small feature structs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id long, mime string, n_bytes int, sha256 string, "
    "mean_luma double, feat array<float>"
)


def make_media_df(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap an arbitrary binary column into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[float, np.ndarray]:
    """Deterministic fake decoder: features derived from a digest of
    the payload — stable across runs/executors, no codec needed."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return float(digest[0]) / 255.0, rng.standard_normal(feat_dim).astype(np.float32)


def extract_image_features(
    media: DataFrame, feat_dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas (Arrow-batched,
    partition-preserving — the per-partition imperative slot the
    reference would use an RDD for).

    Set ``fake=True`` for the deterministic stub; the real decoder slot
    raises NotImplementedError until a codec library is wired in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires a codec library (PIL/opencv) not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub decoder"
                )
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                payload = bytes(payload) if payload is not None else b""
                luma, feat = _fake_decode(payload, feat_dim)
                rows.append(
                    {
                        "media_id": mid,
                        "mime": (meta or {}).get("mime"),
                        "n_bytes": len(payload),
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "mean_luma": luma,
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=IMAGE_FEATURES_DDL)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling stub: one output row per sampled frame
    (media_id, frame_idx, ts_ms, frame_sha256). Fan-out happens inside
    mapInPandas so no shuffle carries the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode not available; pass fake=True for the stub"
                )
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                payload = bytes(payload) if payload is not None else b""
                dur = (meta or {}).get("duration_ms") or 3000
                for i, ts in enumerate(range(0, dur, every_ms)):
                    fr = hashlib.sha256(payload + ts.to_bytes(4, "big")).hexdigest()
                    rows.append(
                        {"media_id": mid, "frame_idx": i, "ts_ms": ts, "frame_sha256": fr}
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        run, schema="media_id long, frame_idx int, ts_ms int, frame_sha256 string"
    )
