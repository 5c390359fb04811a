"""Corpus governance in one pass — the round-3 curation additions
working together (no reference analog; these are the pipeline-side
operators the build brief asks for beyond SURVEY §2): declarative
data-quality validation, numeric profiling + histograms, heavy-hitter
vocabulary, TF-IDF salient terms, fuzzy source-name canonicalization,
and an exactly-quota'd training mixture. Everything is a DataFrame
transformation; the corpus never collects to the driver.

Run: python examples/corpus_quality_report.py [sf_dir]
"""

import sys


def main(spark, sf_dir="/root/testdata/sf0.001"):
    from pyspark.sql import functions as F

    from shc_spark.operators import dq, linkage, sketch, stats, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. contract checks before anything consumes the corpus:
    #    one aggregate scan, a report row per constraint
    report = dq.validate(
        docs,
        [
            dq.completeness("text", 1.0),
            dq.uniqueness("doc_id", 1.0),
            dq.bounds("n_chars", 1, 100_000, 1.0),
            dq.matches("lang", "^[a-z]{2}$", 1.0),
        ],
    )
    failures = report.filter(~F.col("passed")).count()

    # 2. shape of the corpus: numeric profile + length histogram
    prof = stats.profile(docs, ["n_chars"]).collect()[0]
    hist = stats.histogram(docs, "n_chars", bins=6)

    # 3. vocabulary head: bounded-memory heavy hitters with exact counts
    toks = docs.select(F.explode(F.split("text", " ")).alias("term")).where(
        F.col("term") != ""
    )
    hh = sketch.heavy_hitters(toks, "term", min_frac=0.01)

    # 4. per-doc salient terms (what is each document ABOUT)
    salient = text.tfidf_terms(docs, "text", "doc_id", k=2)

    # 5. canonicalize noisy source labels: "src3 feed" and its typo'd
    #    variant "src3 fed" collapse onto one canonical value before
    #    mixture accounting (first-token blocking keeps src3 and src4
    #    feeds in separate candidate blocks)
    noisy = docs.withColumn(
        "source",
        F.concat(
            "source",
            F.when(F.col("doc_id") % 17 == 0, F.lit(" fed")).otherwise(F.lit(" feed")),
        ),
    )
    canon = linkage.canonicalize(noisy, "source", max_dist=1)
    cleaned = (
        noisy.join(canon, noisy["source"] == canon["value"])
        .drop("source", "value")
        .withColumnRenamed("canonical", "source")
    )

    # 6. assemble the training mixture with exact per-source quotas
    quota = {s: 3 for s in [r.source for r in cleaned.select("source").distinct().collect()]}
    mix = text.mixture_sample(cleaned, "source", "doc_id", quota, prefilter=True)

    n_docs = docs.count()
    n_hh = hh.count()
    n_bins = hist.count()
    n_sal = salient.count()
    n_mix = mix.count()
    n_noisy = noisy.select("source").distinct().count()
    n_canon = cleaned.select("source").distinct().count()
    assert failures == 0, "corpus violates its own contract"
    assert prof.n == n_docs and prof.n_null == 0
    assert 0 < n_bins <= 6 and n_hh > 0
    assert n_sal == 2 * n_docs
    assert n_canon < n_noisy, "canonicalization should collapse typo'd sources"
    assert n_mix == sum(quota.values())
    print(
        f"corpus_quality_report: OK ({n_docs} docs, {failures} contract failures, "
        f"{n_bins} length bins, {n_hh} heavy hitters, {n_sal} salient terms, "
        f"{n_noisy}->{n_canon} sources after canonicalization, {n_mix} docs mixed)"
    )


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-corpus-quality-report", cpus=8), *sys.argv[1:])
