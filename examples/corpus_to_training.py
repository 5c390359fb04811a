"""Corpus -> training-ready sequences, end to end — the round-3
operator showcase (no reference analog; SURVEY.md §7 M6): perplexity
+ boilerplate filtering, cross-corpus decontaminating dedup, semantic
dedup over embeddings, context-window chunking, learned BPE
tokenization, and distributed sequence packing. Every stage is a
DataFrame transformation; nothing collects the corpus to the driver.

Run: python examples/corpus_to_training.py [sf_dir]
"""

import sys


def main(spark, sf_dir="/root/testdata/sf0.001"):
    from pyspark.sql import functions as F

    from shc_spark.operators import cluster, dedup, pack, text, tokenizer

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. quality gates: corpus-LM perplexity + boilerplate share
    ppl = text.lm_bigram_scores(docs, "text", "doc_id")
    boiler = text.boilerplate_fraction(docs, "text", "doc_id").withColumnRenamed(
        "id", "doc_id"
    )
    ppl_cut = ppl.approxQuantile("ppl", [0.95], 0.01)[0]
    kept = (
        docs.join(ppl.select("doc_id", "ppl"), "doc_id")
        .join(boiler.select("doc_id", "boiler_frac"), "doc_id")
        .filter((F.col("ppl") <= ppl_cut) & (F.col("boiler_frac") < 0.5))
    )

    # 2. near-dedup the "new half" against the "existing half"
    #    (bipartite LSH), then drop the new-side duplicates
    existing = kept.filter(F.col("doc_id") % 2 == 0)
    incoming = kept.filter(F.col("doc_id") % 2 == 1)
    dup = dedup.minhash_lsh_pairs_between(
        incoming, existing, "text", "doc_id", num_perm=32, bands=16, threshold=0.8
    ).select(F.col("id_a").alias("doc_id")).distinct()
    merged = existing.unionByName(incoming.join(dup, "doc_id", "left_anti"))

    # 3. semantic dedup: one representative embedding per k-means
    #    cluster keeps topical diversity while trimming redundancy
    reps = cluster.semantic_dedup(emb, "embedding", "vec_id", k=8, max_iter=3)

    # 3b. SemDeDup (r10, Abbas et al. 2023): the FINER embedding prune —
    #     within each cluster drop examples with a higher-ranked
    #     ε-neighbor instead of keeping just one representative
    sem = cluster.semdedup(emb, "embedding", "vec_id", k=8, threshold=0.45)
    sem_kept = sem.filter(F.col("kept"))

    # 3c. DSIR (r10, Xie et al. 2023): rank the merged corpus by bigram
    #     log-likelihood-ratio affinity to a target domain (src0 docs)
    dsir_top = text.dsir_select(
        merged.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "text", "doc_id", vocab_size=2048, n=50,
    )

    # 4. chunk to context windows, tokenize with corpus-learned BPE
    chunks = text.chunk_text(merged, "text", "doc_id", chunk_size=240, overlap=40)
    chunk_ids = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("cid"), "chunk_text"
    )
    merges = tokenizer.train_bpe(merged, "text", num_merges=50, min_freq=2)
    toks = tokenizer.bpe_encode(chunk_ids, merges, "chunk_text", "cid")

    # 5. pack into fixed 512-token training sequences (distributed
    #    prefix-sum — no single-partition window)
    packed = pack.pack_sequences(toks, "n_tokens", "cid", seq_len=512)

    n_docs, n_kept, n_merged = docs.count(), kept.count(), merged.count()
    n_chunks, n_reps = chunks.count(), reps.count()
    n_emb, n_sem = emb.count(), sem_kept.count()
    n_dsir = dsir_top.count()
    total_toks = packed.agg(F.sum("n")).collect()[0][0]
    n_bins = packed.agg(F.max("bin_end")).collect()[0][0] + 1
    assert 0 < n_kept <= n_docs and 0 < n_merged <= n_kept
    assert n_chunks >= n_merged and 0 < n_reps <= 8
    # finer than keep-one; semdedup may legitimately keep EVERYTHING
    # on a diverse corpus (no within-cluster pair crosses the cosine
    # threshold), so <= on both sides (ADVICE r10)
    assert n_reps <= n_sem <= n_emb
    assert 0 < n_dsir <= 50
    assert n_bins == (total_toks + 511) // 512
    print(
        f"corpus_to_training: OK ({n_docs} docs -> {n_merged} deduped -> "
        f"{n_chunks} chunks -> {total_toks} BPE tokens -> {n_bins} sequences; "
        f"{n_reps} semantic reps; semdedup keeps {n_sem}/{n_emb}; "
        f"DSIR top-{n_dsir})"
    )


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from shc_spark.session import get_spark

    main(get_spark("example-corpus-to-training", cpus=8), *sys.argv[1:])
