"""Training-data pipeline in one pass — the M6 extension showcase
(no reference analog; SURVEY.md §7 M6): language-ID + quality
scoring + exact and fuzzy dedup + deterministic sampling over the
documents table, every stage a DataFrame transformation.

Run: python examples/data_pipeline.py [sf_dir]
"""

import sys


def main(spark, sf_dir="/root/testdata/sf0.001"):
    from pyspark.sql import functions as F

    from shc_spark.operators import dedup, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. annotate: language, quality features, token counts
    scored = text.quality_features(docs, "text").withColumn(
        "lang_guess", text.lang_id(F.col("text"))
    )

    # 2. drop exact duplicates (normalized text hash)
    deduped = dedup.exact_dedup(scored, ["text"], "doc_id")

    # 3. flag fuzzy near-dups (banded MinHash-LSH, exact-verified)
    pairs = dedup.minhash_lsh_pairs(deduped, "text", "doc_id", num_perm=32, bands=16)
    drop = pairs.select(F.greatest("id_a", "id_b").alias("doc_id")).distinct()
    kept = deduped.join(drop, "doc_id", "left_anti")

    # 4. reproducible 15.6% sample for a holdout
    holdout = text.deterministic_sample(kept, "doc_id")

    n_docs, n_kept, n_holdout = docs.count(), kept.count(), holdout.count()
    assert n_kept <= n_docs and 0 < n_holdout < n_kept
    print(f"data_pipeline: OK ({n_docs} docs -> {n_kept} kept -> {n_holdout} holdout)")


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-pipeline", cpus=8), *sys.argv[1:])
