"""Multimodal pipeline end-to-end over REAL in-repo codecs — no
external media library anywhere:

1. IMAGES: render PNGs, decode + area-average RESIZE to a thumbnail
   grid, perceptual dHash for near-dup detection.
2. VIDEO: build Motion-JPEG AVIs (every frame an independent baseline
   JPEG through the from-scratch T.81 codec), run shot-boundary
   detection and frame sampling over the COMPRESSED transport.
3. AUDIO: synthesize PCM WAV, linear-RESAMPLE to a new rate, extract
   spectral band energies.

Everything is a map-only mapInPandas stage: payload bytes never cross
a shuffle; only small feature rows leave the scan.

Run: python examples/media_pipeline.py
"""


def main(spark, root=None):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from shc_spark.operators import multimodal
    from shc_spark.operators.codecs import encode_avi, encode_png, encode_wav

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)

    # -- 1. images: decode -> resize -> dhash ---------------------------
    @F.pandas_udf("binary")
    def png(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            cps = [(ord(t[i]) % 256) if i < len(t) else 32 for i in range(72)]
            out.append(encode_png(np.array(cps, dtype=np.uint8).reshape(8, 9)))
        return pd.Series(out)

    images = multimodal.make_media_df(
        docs.withColumn("payload", png("text")), "doc_id", "payload", "image/png"
    )
    thumbs = multimodal.resize_image(images, 4, 3, emit="pixels")
    hashes = multimodal.perceptual_dhash(images, grid=8)
    print("thumbnail pixels:", thumbs.count(), "| dhashes:", hashes.count())

    # -- 2. Motion-JPEG video: scene cuts + frame sampling --------------
    @F.pandas_udf("binary")
    def mjpg(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            levels = [(ord(t[i]) % 256) if i < len(t) else 32 for i in range(5)]
            frames = np.stack([np.full((8, 8, 3), v, dtype=np.uint8) for v in levels])
            out.append(encode_avi(frames, fps=2, codec="MJPG"))
        return pd.Series(out)

    videos = multimodal.make_media_df(
        docs.withColumn("payload", mjpg("text")), "doc_id", "payload", "video/avi"
    )
    cuts = multimodal.scene_cuts(videos, threshold=30.0)
    frames = multimodal.frame_sample(videos, every_ms=500, fake=False)
    print("scene cuts:", cuts.count(), "| sampled frames:", frames.count())

    # -- 3. audio: resample + spectrogram -------------------------------
    @F.pandas_udf("binary")
    def wav(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            cps = [(ord(t[i]) % 256) if i < len(t) else 32 for i in range(128)]
            smp = (np.array(cps, dtype=np.int32) - 128) * 200
            out.append(encode_wav(smp.astype("<i2"), 8000))
        return pd.Series(out)

    audio = multimodal.make_media_df(
        docs.withColumn("payload", wav("text")), "doc_id", "payload", "audio/wav"
    )
    res = multimodal.resample_audio(audio, 16000, emit="payload")
    bands = multimodal.extract_audio_spectrogram(audio, frame_samples=64, n_bands=4)
    print("resampled clips:", res.count(), "| spectrogram frames:", bands.count())


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from shc_spark.session import get_spark

    main(get_spark("example-media", cpus=8))
