"""Build-once serving indexes: the nightly-increment workflow.

A 100 TB corpus is signed/quantized ONCE into a persisted index;
every later increment (tonight's crawl, a fresh embedding batch)
queries it without touching the corpus again:

1. DEDUP INDEX — MinHash band keys + feature rows, bucket-partitioned:
   `dedup_index_pairs` dedups a fresh increment via a partition-pruned
   bucket join + pruned exact verification (row-identical to the
   inline bipartite operator).
2. IVF INDEX — coarse quantizer + cid-partitioned postings:
   `ivf_index_topk` searches only the probed partitions.
3. Both support APPEND (sign/assign only the new rows with the saved
   parameters) and tombstone DELETE (takedowns mask instantly;
   rebuild purges).

Run: python examples/serving_indexes.py
"""


def main(spark, root=None):
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from shc_spark.operators import dedup, similarity

    root = root or tempfile.mkdtemp(prefix="shc_serving_")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))

    # -- 1. dedup index over the "existing corpus" ---------------------
    dpath = os.path.join(root, "dedup_index")
    shutil.rmtree(dpath, ignore_errors=True)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    increment = docs.filter(F.col("doc_id") % 2 == 1)
    dedup.build_dedup_index(corpus, dpath, num_perm=64, bands=32, n=3)
    pairs = dedup.dedup_index_pairs(spark, dpath, increment)
    hits = pairs.collect()
    print(f"increment near-dups vs indexed corpus: {len(hits)}")
    ref = dedup.minhash_lsh_pairs_between(
        increment, corpus, "text", "doc_id", num_perm=64, bands=32, n=3
    ).collect()
    assert sorted(map(tuple, hits)) == sorted(map(tuple, ref)), (
        "index query must equal the inline bipartite operator"
    )

    # accepted increment docs join the corpus: sign only them
    accepted = increment.join(
        pairs.select(F.col("id_a").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    dedup.append_to_dedup_index(accepted, dpath)
    print(f"appended {accepted.count()} accepted docs to the index")

    # takedown: tombstone one matched corpus doc, re-query
    if hits:
        victim = hits[0]["id_b"]
        dedup.delete_from_dedup_index(spark, dpath, [victim])
        left = {r["id_b"] for r in dedup.dedup_index_pairs(spark, dpath, increment).collect()}
        assert victim not in left, "tombstoned doc must be masked"
        print(f"tombstoned doc {victim}: masked from every later query")

    # -- 2. IVF index over the embeddings ------------------------------
    vpath = os.path.join(root, "ivf_index")
    shutil.rmtree(vpath, ignore_errors=True)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    similarity.build_ivf_index(old, vpath, "embedding", "vec_id", dim=64)
    similarity.append_to_ivf_index(new, vpath, "embedding", "vec_id")
    q = emb.filter(F.col("vec_id") < 4)
    top = similarity.ivf_index_topk(spark, path=vpath, queries=q, k=5, nprobe=8)
    cent = similarity.read_ivf_centroids(spark, vpath)
    ref = similarity.ivf_topk(
        q, emb, "embedding", "vec_id", k=5, dim=64, centroids=cent, nprobe=8
    )
    assert sorted(map(tuple, top.collect())) == sorted(map(tuple, ref.collect())), (
        "appended index search must equal inline search over the union"
    )
    print("ivf index (build + append) search matches inline search")

    victims = [r["neighbor_id"] for r in top.limit(1).collect()]
    similarity.delete_from_ivf_index(spark, vpath, victims)
    after = similarity.ivf_index_topk(spark, path=vpath, queries=q, k=5, nprobe=8)
    assert not set(victims) & {r["neighbor_id"] for r in after.collect()}
    print(f"tombstoned vector {victims[0]}: masked from search")

    # -- 3. SQ8 storage: same index, ~2-4x fewer posting bytes ---------
    spath = os.path.join(root, "ivf_index_sq8")
    shutil.rmtree(spath, ignore_errors=True)
    similarity.build_ivf_index(
        emb, spath, "embedding", "vec_id", dim=64, storage="sq8"
    )
    sq = similarity.ivf_index_topk(spark, path=spath, queries=q, k=5, nprobe=8)
    assert sq.count() == q.count() * 5

    def _bytes(p):
        t = 0
        for r, _dirs, files in os.walk(os.path.join(p, "postings")):
            t += sum(os.path.getsize(os.path.join(r, f)) for f in files)
        return t

    print(
        f"sq8 postings {_bytes(spath)} bytes vs float {_bytes(vpath)} "
        "(codebook saved; appends encode under it)"
    )

    # -- 3b. PQ storage: the 16-32x tier + refine stage ----------------
    qpath = os.path.join(root, "ivf_index_pq")
    shutil.rmtree(qpath, ignore_errors=True)
    similarity.build_ivf_index(
        emb, qpath, "embedding", "vec_id", dim=64, storage="pq",
        pq_m=16, pq_codes=256,
    )
    refined = similarity.ivf_index_topk(
        spark, path=qpath, queries=q, k=5, nprobe=8,
        rerank_with=emb, rerank_factor=20,
    )
    assert refined.count() == q.count() * 5
    print(
        f"pq postings {_bytes(qpath)} bytes vs float {_bytes(vpath)} "
        "(ADC search + exact re-rank of R*k survivors)"
    )

    # -- 4. BM25 inverted index: text retrieval without re-tokenizing --
    from shc_spark.operators import text, textindex

    tpath = os.path.join(root, "text_index")
    shutil.rmtree(tpath, ignore_errors=True)
    terms = ["join", "scan", "vector"]
    textindex.build_text_index(corpus, tpath)
    textindex.append_to_text_index(increment, tpath)
    got = textindex.text_index_topk(spark, tpath, terms, k=10).collect()
    ref = text.bm25_search(docs, terms, "text", "doc_id", k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref], (
        "index BM25 must equal the inline search over the union"
    )
    print(f"bm25 index (build + append) top-10 matches inline search")

    # -- 5. hybrid serving: BM25 + vector RRF from the two indexes ----
    qv = emb.filter(F.col("vec_id") == 2).select("embedding").collect()[0][0]
    fused = similarity.hybrid_index_rrf(
        spark, tpath, vpath, terms, qv, k=5, nprobe=8
    ).collect()
    assert len(fused) == 5
    print("hybrid rrf (text index + ivf index):",
          [(r["doc_id"], r["rrf"]) for r in fused[:3]])

    # -- 5b. MMR diversified re-rank over the retrieval pool (r11) -----
    # the standard last serving step: drop near-identical hits before
    # they reach a prompt. Step 1 must equal the plain top-1 (no
    # diversity term yet); selections are distinct by construction.
    queries = emb.filter(F.col("vec_id") < 3)
    mmr = similarity.mmr_rerank(
        queries, emb, "embedding", "vec_id", k=3, pool=8, lam=0.7,
        div_weight=0.3,
    ).collect()
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.cosine_topk(queries, emb, "embedding", "vec_id", k=1).collect()
    }
    for qid in top1:
        picks = [r["neighbor_id"] for r in sorted(
            (r for r in mmr if r["query_id"] == qid), key=lambda r: r["step"]
        )]
        assert len(picks) == len(set(picks)) == 3
        assert picks[0] == top1[qid], (qid, picks, top1[qid])
    print("mmr re-rank: 3 diverse picks/query, step1 == plain top-1")

    # -- 6. batched serving: N increments, ONE pruned pass -------------
    incs = {
        "crawl_mon": docs.filter(F.col("doc_id") % 4 == 1),
        "crawl_tue": docs.filter(F.col("doc_id") % 4 == 3),
    }
    batched = dedup.dedup_index_pairs_batch(spark, dpath, incs).collect()
    per_call = {
        name: {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in dedup.dedup_index_pairs(spark, dpath, df).collect()
        }
        for name, df in incs.items()
    }
    for name in incs:
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in batched
            if r["increment_id"] == name
        }
        assert got == per_call[name], name
    print(
        f"batched dedup serving: {len(batched)} pairs across "
        f"{len(incs)} increments in one pruned pass == per-call results"
    )
    print("serving_indexes example OK")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from shc_spark.session import get_spark

    main(get_spark("example-serving", cpus=8))
