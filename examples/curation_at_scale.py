"""Round-14 curation additions: the scale-path variants of semantic
dedup and index ingestion, plus the real pixel descriptor.

1. SHARDED SEMDEDUP — `cluster.semdedup_sharded` runs the WHOLE
   SemDeDup pipeline (seed -> Lloyd -> assignment -> epsilon-neighbor
   prune) inside one task per md5 shard: total work LINEAR in corpus
   size (the AUTO-k default is O(n^2/512) assign work — the paper's
   GPU shape), one shuffle, no driver-side centroids. A shard's
   decisions equal a standalone semdedup of its rows.
2. DEDUP-INDEX L0 SIDECAR — small appends land in an unpartitioned
   pending sidecar (O(increment) files instead of one file per bucket
   dir), queries see them immediately, and `fold_dedup_index` moves
   the accumulated mass into the bucketed layout in one amortized
   write — the memstore -> store-file move of an LSM.
3. IMAGE DESCRIPTOR — `multimodal.extract_image_descriptor` computes
   deterministic pixel features (block means, intensity histogram,
   |gradient| stats) through the REAL from-scratch PNG decode.

Run: python examples/curation_at_scale.py
"""


def main(spark, root=None):
    import os
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from shc_spark.operators import cluster, dedup, multimodal

    root = root or tempfile.mkdtemp(prefix="shc_curation_")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))

    # -- 1. sharded semantic dedup -------------------------------------
    out = cluster.semdedup_sharded(
        emb, "embedding", "vec_id", num_shards=2, target_cluster_size=64,
        max_iter=2, threshold=0.45,
    )
    rows = out.collect()
    assert len(rows) == emb.count(), "one decision per input vector"
    kept = sum(1 for r in rows if r["kept"])
    print(f"sharded semdedup: {len(rows)} vectors -> {kept} kept "
          f"({len(rows) - kept} near-dups dropped) across 2 shards")
    # every drop names a same-shard same-cluster dominator
    by_id = {r["vec_id"]: r for r in rows}
    for r in rows:
        if not r["kept"]:
            d = by_id[r["dup_of"]]
            assert (d["shard"], d["cluster"]) == (r["shard"], r["cluster"])

    # -- 2. dedup-index appends through the L0 sidecar ------------------
    dpath = os.path.join(root, "dedup_index")
    shutil.rmtree(dpath, ignore_errors=True)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    dedup.build_dedup_index(corpus, dpath, num_perm=64, bands=32, n=3)
    inc = docs.filter(F.col("doc_id") % 4 == 1)
    dedup.append_to_dedup_index(inc, dpath, bucketed=False,
                                fold_threshold=1 << 60)
    assert dedup._has_pending(dpath), "small append lands in the sidecar"
    q = docs.filter(F.col("doc_id") % 4 == 3)
    got = sorted(map(tuple, dedup.dedup_index_pairs(spark, dpath, q).collect()))
    print(f"query over bucketed+sidecar: {len(got)} near-dup pairs")
    dedup.fold_dedup_index(spark, dpath)
    assert not dedup._has_pending(dpath), "fold moved the sidecar into buckets"
    after = sorted(map(tuple, dedup.dedup_index_pairs(spark, dpath, q).collect()))
    assert got == after, "fold must not change query results"
    print("fold: sidecar -> bucketed layout, results identical")

    # -- 3. real pixel descriptor ---------------------------------------
    from shc_spark.operators.codecs import encode_png

    @F.pandas_udf("binary")
    def png(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            cps = [(ord(t[i]) % 256) if i < len(t) else 32 for i in range(64)]
            out.append(encode_png(np.array(cps, dtype=np.uint8).reshape(8, 8)))
        return pd.Series(out)

    media = multimodal.make_media_df(
        docs.limit(50).withColumn("payload", png("text")),
        "doc_id", "payload", "image/png",
    )
    feats = multimodal.extract_image_descriptor(media).collect()
    assert len(feats) == 50
    f0 = feats[0]
    assert f0["width"] == 8 and f0["height"] == 8
    assert sum(f0[f"h{k}"] for k in range(4)) == 64, "histogram covers all pixels"
    print(f"image descriptor: mean_luma={f0['mean_luma']:.4f} "
          f"grad_x={f0['grad_x']:.2f} hist={[f0[f'h{k}'] for k in range(4)]}")

    shutil.rmtree(root, ignore_errors=True)
    print("curation_at_scale example OK")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from shc_spark.session import get_spark

    main(get_spark("example-curation-at-scale", cpus=8))
