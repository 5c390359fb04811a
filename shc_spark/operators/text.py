"""Text-analysis operators for training-data pipelines.

All hot-path computation is JVM-side ``pyspark.sql.functions``
(whole-stage codegen, no Python in the loop) — at 100 TB these run as
a single scan stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword language-ID
# heuristic; chosen to be disjoint across languages
LANG_MARKERS = {
    "en": ["the", "and", "with", "from"],
    "de": ["der", "und", "nicht", "das"],
    "fr": ["le", "et", "les", "des"],
    "es": ["el", "los", "por", "una"],
    "zh": ["de5", "shi4", "zai4", "he2"],  # pinyin-ish markers for synthetic zh
}


def words(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: split on word boundaries AND punctuation,
    count non-empty pieces — a cheap, deterministic stand-in for a real
    tokenizer's piece count."""
    pieces = F.split(text, r"[\s\p{Punct}]+")
    return F.size(F.filter(pieces, lambda p: p != ""))


def quality_score(t: Column) -> Column:
    """The composite quality score in [0, 1] (rounded to 4dp) as a
    bare column expression — the same formula :func:`quality_features`
    emits as ``q_score``, reusable where only the score is needed
    (e.g. a fused curation rule) without projecting the full feature
    set."""
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_stop = F.size(
        F.filter(words(t), lambda w: w.isin(*[m for ms in LANG_MARKERS.values() for m in ms]))
    )
    punct_ratio = (n_punct / F.greatest(n_chars, F.lit(1))).cast("double")
    stop_ratio = (n_stop / F.greatest(n_tokens, F.lit(1))).cast("double")
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    ).cast("double")
    return F.round(score, 4)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite score in [0, 1]. Pure column expressions — one codegen'd
    projection."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_stop = F.size(
        F.filter(words(t), lambda w: w.isin(*[m for ms in LANG_MARKERS.values() for m in ms]))
    )
    avg_word_len = (n_alpha / F.greatest(n_tokens, F.lit(1))).cast("double")
    punct_ratio = (n_punct / F.greatest(n_chars, F.lit(1))).cast("double")
    stop_ratio = (n_stop / F.greatest(n_tokens, F.lit(1))).cast("double")
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    ).cast("double")
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(avg_word_len, 4).alias("q_avg_word_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(stop_ratio, 4).alias("q_stop_ratio"),
        F.round(score, 4).alias("q_score"),
    )


def lang_id(text: Column) -> Column:
    """Stopword-marker language ID: count marker hits per language,
    argmax wins (ties broken by language-code order). Returns 'und'
    when nothing matches."""
    ws = words(text)

    def marker_hits(markers):
        # single-arg lambda: pyspark passes (element, index) to 2-arg
        # lambdas, so the marker list must be captured via a factory
        return F.size(F.filter(ws, lambda w: w.isin(*markers)))

    scores = [
        F.struct(marker_hits(markers).alias("hits"), F.lit(code).alias("lang"))
        for code, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, n: int = 3) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct n-gram shingles. Identical content in any shingle
    permutation -> identical fingerprint; robust to duplicated
    paragraphs, cheap to compare (one string equality)."""
    sh = shingles(text, n)
    return F.md5(F.array_join(F.array_sort(sh), "\x01"))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (1-based
    element_at keeps the expression identical to the DuckDB oracle).

    Documents with fewer than n words yield an EMPTY array — guarded
    explicitly because Spark's sequence(1, 0) is the DESCENDING
    [1, 0], not [] (which would crash element_at)."""
    ws = words(text)
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(ws, i + k) for k in range(n)])  # noqa: E731
    return F.when(
        F.size(ws) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def rolling_hash(text: Column, window: int = 8) -> Column:
    """Per-document min-of-rolling-hash (winnowing-style selector):
    min over crc32 of each window-gram — a cheap locality-sensitive
    scalar used for candidate bucketing."""
    sh = shingles(text, window)
    return F.array_min(F.transform(sh, lambda s: F.crc32(s)))


# PII patterns restricted to syntax valid in BOTH Java regex (Spark)
# and RE2 (DuckDB): char classes + bounded repetition, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[A-Za-z0-9./_-]+",
    "phone": r"\+[0-9]{1,2} [0-9]{3} [0-9]{4}",
}


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII signal counts (emails / URLs / phone shapes) +
    a has_pii flag — the redaction-or-drop gate every training-data
    pipeline runs. Pure codegen'd regexp_count projections: one scan,
    zero shuffles, no Python."""
    t = F.col(text_col)
    counts = {k: F.regexp_count(t, F.lit(p)) for k, p in PII_PATTERNS.items()}
    any_hit = None
    for c in counts.values():
        any_hit = c > 0 if any_hit is None else (any_hit | (c > 0))
    return df.select(
        "*",
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        any_hit.alias("has_pii"),
    )


def repetition_features(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Gopher-style repetition filter signal: the fraction of a doc's
    n-grams taken by its single most frequent n-gram (1.0 = the doc is
    one phrase looped; ~1/total = no repetition).

    Shape for scale: explode (id, gram) -> two-level aggregation with
    map-side partial combine; the wide text column never shuffles —
    only the gram rows do. Docs with < n words have no grams and are
    excluded (same as the SQL oracle)."""
    ws = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(ws, i + k) for k in range(n)])  # noqa: E731
    grams = F.when(F.size(ws) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )
    exploded = df.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
    per_gram = exploded.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("id").agg(
        F.sum("c").alias("total_grams"),
        F.max("c").alias("max_gram_count"),
        F.round(F.max("c") / F.sum("c"), 4).alias("rep_ratio"),
    )


def deterministic_sample(
    df: DataFrame, id_col: str, hex_threshold: str = "28"
) -> DataFrame:
    """Hash-based deterministic sampling: keep rows whose
    md5(id)'s first two hex chars sort below ``hex_threshold``
    (default '28' -> 40/256 ~= 15.6%). Unlike rand()-based sampling
    this is reproducible across engines, runs, and retries — the
    property a training-data pipeline needs for auditable subsets —
    and it is exactly expressible in SQL, so the gate is value-checked
    rather than rows-only."""
    return df.filter(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2) < F.lit(hex_threshold)
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    num_shards: int = 8,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic epoch shuffling + sharding for training-data
    delivery: every row gets (shard, pos) where shard =
    first-hex-byte(md5(epoch:id)) mod num_shards and pos is the row's
    rank within its shard under the md5 ordering. Changing ``epoch``
    reshuffles the whole corpus; same epoch always reproduces the same
    order — across engines, runs, and retries (no rand()).

    Output: (id, shard, pos). Scale shape: one hash projection + one
    shuffle on shard; the rank windows are PARTITIONED by shard so
    every shard ranks in parallel (no single-partition window). The
    md5 hex string both orders and buckets, so it's exactly
    expressible in SQL and the gate is value-checked."""
    h = F.md5(F.concat(F.lit(f"{epoch}:"), F.col(id_col).cast("string")))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn(
            "shard", (F.conv(F.substring("h", 1, 2), 16, 10).cast("int") % num_shards)
        )
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .select(id_col, "shard", "pos")
    )


def bm25_search(
    df: DataFrame,
    terms: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k document search for a bag of query terms.

    Classic scalable shape: tf from an exploded (id, term) count
    filtered to the |Q| query terms BEFORE the shuffle (gram rows for
    non-query terms never leave the scan); df/idf per term is |Q| rows
    broadcast back; N and avgdl are a single-row broadcast join (no
    driver collect). Scoring is one codegen'd projection; the global
    top-k is TakeOrdered on (rounded score desc, id asc)."""
    ws = F.split(F.col(text_col), " ")
    # deliberately NOT cached: the three consumers re-scan a 2-column
    # pruned projection (cheap, shuffle-free), and a cache here would
    # pin one tokenized-corpus copy per call for the session lifetime
    base = df.select(F.col(id_col).alias("id"), ws.alias("ws"))
    dl = base.select("id", F.size("ws").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tok = base.select("id", F.explode("ws").alias("term")).filter(
        F.col("term").isin(list(terms))
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "id")
        .join(F.broadcast(stats))
        .withColumn(
            "w",
            F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("id")
        .agg(F.round(F.sum("w"), 4).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("id")).limit(k)


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, thresholds: dict, default: str = "00"
) -> DataFrame:
    """Per-stratum deterministic hash sampling — the domain-mixing
    primitive of a training-data pipeline: "keep 50% of web, 12.5% of
    forums, drop the rest" as one codegen'd filter over the scan, no
    shuffle, reproducible across engines/runs/retries (same
    md5-threshold scheme as ``deterministic_sample``).

    ``thresholds`` maps stratum value -> 2-hex-char cutoff ('80' =
    128/256 = 50%); strata absent from the map get ``default`` ('00' =
    drop). The literal map is tiny (domain lists are; thousands at
    most) and lives in the task binary, not a join."""
    pairs = [x for kv in thresholds.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    thr = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)], F.lit(default)
    )
    return df.filter(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2) < thr)


def _word_ngram_hashes(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, h) exploded per-doc-distinct word n-gram hashes, one
    vectorized mapInPandas pass (pd.util.hash_array — deterministic
    fixed-key siphash). The JVM transform/xxhash64 HOF version of this
    is interpreted per element and measured 10x slower at sf0.1 (the
    round-1 MinHash lesson, re-learned)."""
    import numpy as np
    import pandas as pd

    from shc_spark.operators.dedup import _widen

    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            ids: list = []
            grams: list = []
            for i, t in zip(pdf["__id"], pdf["__text"]):
                w = t.split(" ") if t else []
                if len(w) < n:
                    continue
                g = {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
                grams.extend(g)
                ids.extend([i] * len(g))
            if not ids:
                continue
            hv = pd.util.hash_array(np.array(grams, dtype=object)).view(np.int64)
            yield pd.DataFrame({"id": ids, "h": hv})

    return _widen(df).select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    ).mapInPandas(gen, f"id {id_type}, h long")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """(id) corpus docs sharing at least one word n-gram with the
    benchmark set — eval-set decontamination, the pipeline step that
    keeps test data out of training corpora (n=13 in published LLM
    recipes; lower here only because the synthetic docs are ~50 words).

    Scale shape: the benchmark side is small (eval sets are MBs), so
    its distinct shingle hashes BROADCAST; the corpus side explodes to
    (id, shingle) narrowly — no corpus shuffle, no pre-aggregation —
    and the broadcast left-semi join keeps only matching shingles.
    Only the (rare) contaminated ids reach the final distinct, so the
    one real shuffle carries almost nothing. Shingle identity is a
    deterministic 64-bit hash of the joined n-gram text, identical on
    both sides (a false contamination needs a collision, ~1e-9 at
    millions of shingles)."""
    bench = _word_ngram_hashes(benchmark, text_col, id_col, n).select("h").distinct()
    corp = _word_ngram_hashes(corpus, text_col, id_col, n)
    return (
        corp.join(F.broadcast(bench), "h", "left_semi")
        .select(F.col("id"))
        .distinct()
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 100,
    overlap: int = 20,
) -> DataFrame:
    """Overlapping character-window chunks: chunk i covers characters
    [i*stride, i*stride + chunk_size) with stride = chunk_size -
    overlap; every document emits >= 1 chunk and the windows jointly
    cover the whole text. The context-window splitter every
    training/RAG pipeline needs in front of a tokenizer.

    Output: (id, chunk_id, chunk_text, chunk_chars).

    Scale shape: one codegen'd projection + explode — zero shuffles,
    zero Python; fan-out is len/stride rows per doc and Spark splits
    the generated rows across whole-stage-codegen batches."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    t = F.col(text_col)
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.length(t) - F.lit(overlap)) / F.lit(float(stride))).cast("long"),
    )
    exploded = df.select(
        F.col(id_col),
        t.alias("__t"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    chunk = F.substring(
        F.col("__t"), (F.col("chunk_id") * stride + 1).cast("int"), chunk_size
    )
    return exploded.select(
        F.col(id_col),
        "chunk_id",
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_chars"),
    )


def chunk_words(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap_tokens: int = 8,
) -> DataFrame:
    """Token-window variant of :func:`chunk_text`: windows of
    ``chunk_tokens`` whitespace tokens advancing by chunk_tokens -
    overlap_tokens, re-joined with single spaces. Same zero-shuffle
    explode shape."""
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    ws = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.size(ws) - F.lit(overlap_tokens)) / F.lit(float(stride))).cast("long"),
    )
    exploded = df.select(
        F.col(id_col),
        ws.alias("__ws"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__ws"), (F.col("chunk_id") * stride + 1).cast("int"), chunk_tokens
    )
    return exploded.select(
        F.col(id_col),
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("chunk_tokens"),
    )


def lm_bigram_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document bigram language-model score over the corpus's own
    statistics — the CCNet/Gopher-style "perplexity under a cheap LM"
    quality signal, here with an add-alpha-smoothed bigram model
    trained on the corpus itself (no external artifacts):

        logp(w_i | w_{i-1}) = ln((c(w_{i-1} w_i) + a) / (c(w_{i-1}) + a*V))

    Output: (id, n_bigrams, avg_logp, ppl = exp(-avg_logp)); high ppl
    = the document's word transitions are unusual for the corpus
    (boilerplate and word-salad both surface). Documents with < 2
    tokens have no bigrams and are omitted.

    Scale shape (r11 — was 6.4x at x100 with fat bigram-string
    shuffle keys and a per-bigram substring_index): every count table
    and scoring join is keyed on FIXED-WIDTH xxhash64 int64 columns
    (the heavy_hitters r10 trick) — the word/bigram strings are
    hashed at assembly and dropped before any shuffle, so the three
    shuffles of the instance stream move 8-byte keys, map-side
    combined. Bigram assembly emits (a, b) structs directly from one
    zip_with (no string concat, no substring_index recovery).
    Measured at x100 (500k docs / 27M tokens): 5.0s vs 7.0s before;
    a fused-pandas pair pass and a distinct-bigram pre-join variant
    both measured SLOWER (9.3s / 14.5s) — the Arrow round trip of
    the token stream costs more than the interpreted zip_with it
    replaces. A 64-bit hash collision would merge two count buckets:
    probability ~n^2/2^65 (~3% of one colliding PAIR at 1e9 distinct
    bigrams, perturbing one smoothed logp by ulps) — the right trade
    for a quality-scoring signal; the oracle replays string-keyed
    counts and stays value-identical at gate scale."""
    ws = F.split(F.col(text_col), " ")
    docs = df.select(F.col(id_col).alias("id"), ws.alias("ws"))
    toks = docs.select(F.explode("ws").alias("w"))
    uni = toks.select(F.xxhash64("w").alias("ah")).groupBy("ah").agg(
        F.count(F.lit(1)).alias("cu")
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("vn"))  # 1-row scalar
    pairs = F.zip_with(
        F.slice("ws", 1, F.size("ws") - 1),
        F.slice("ws", 2, F.size("ws") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bi = docs.select("id", F.explode(pairs).alias("p")).select(
        "id", F.xxhash64("p.a").alias("ah"), F.xxhash64("p.a", "p.b").alias("bgh")
    )
    big = bi.groupBy("bgh").agg(F.count(F.lit(1)).alias("cb"))
    lp = F.log((F.col("cb") + alpha) / (F.col("cu") + alpha * F.col("vn")))
    scored = (
        bi.join(big, "bgh")
        .join(uni, "ah")
        .crossJoin(F.broadcast(vocab))
        .select("id", lp.alias("lp"))
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("avg_logp"),
            F.round(F.exp(-F.avg("lp")), 4).alias("ppl"),
        )
        .withColumnRenamed("id", id_col)
    )


def boilerplate_fraction(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3, min_df: int = 5
) -> DataFrame:
    """(id, n_shingles, n_boiler, boiler_frac) — per-doc share of word
    n-grams that are corpus boilerplate (appearing in >= ``min_df``
    distinct docs): navigation chrome, disclaimers, templates. The
    C4/Gopher-style cleanup signal for deciding what to strip or drop.

    Scale shape: one vectorized shingle pass (_word_ngram_hashes),
    doc-frequency via a map-side-combined groupBy on the 8-byte hash,
    and the boilerplate dictionary (df >= min_df is SMALL by
    construction — boilerplate is the head of the distribution)
    broadcasts back into a semi-join-shaped aggregation; the full
    shingle set never joins against itself."""
    shingles = _word_ngram_hashes(df, text_col, id_col, n)
    boiler = (
        shingles.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )
    flagged = shingles.join(
        F.broadcast(boiler).withColumn("__b", F.lit(1)), "h", "left"
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__b").alias("n_boiler"),
        )
        .select(
            F.col("id"),
            "n_shingles",
            "n_boiler",
            F.round(F.col("n_boiler") / F.col("n_shingles"), 4).alias("boiler_frac"),
        )
    )


def tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    broadcast_idf: bool = False,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword /
    salient-term extraction signal for corpus curation and retrieval:

        tf(t, d)  = count(t in d) / len(d)
        idf(t)    = ln((N + 1) / (df(t) + 1)) + 1     (smoothed)
        tfidf     = round(tf * idf, 6)

    Output: (id, term, tfidf, rank), rank 1..k per document ordered by
    (tfidf desc, term asc) — ranking happens on the ROUNDED score so
    the ordering is engine-neutral.

    Scale shape (r11, second pass — was 6.9x at x100, then 7.4x after
    the first rewrite): exactly THREE corpus shuffles, each carrying
    the combined (id, term, c) pair stream, never the raw token
    stream: (1) groupBy(id, term) with map-side combine — repeated
    terms collapse before the exchange; (2) the document frequency as
    a COUNT WINDOW over term partitioning — the r10/r11a
    groupBy(term) + join shape paid TWO term-keyed exchanges of the
    pair stream for the same number (measured: join shape 7.4s,
    window shape ~5s at x100); (3) one id-keyed exchange that both
    the doc-length sum window and the final top-k rank window reuse.
    The IDF side is never broadcast by hint: a corpus-sized
    vocabulary (3M terms at the x100 probe) made the broadcast build
    the slowest stage; pass ``broadcast_idf=True`` to get the
    explicit groupBy+broadcast-join shape back when the term
    dictionary is known tiny. N is a 1-row broadcast scalar (no
    driver collect). A fused pandas counting pass and a term-first
    partitioning were both measured and rejected (9.6s / 6.4s at
    x100 — the Arrow round trip of the token stream costs more than
    JVM explode)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).where(F.col("term") != "")
    tc = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("c"))
    n = df.select(F.col(id_col)).agg(F.countDistinct(id_col).alias("nn"))
    score = F.round(
        (F.col("c") * 1.0 / F.col("len"))
        * (F.log((F.col("nn") + 1.0) / (F.col("dfc") + 1.0)) + 1),
        6,
    )
    if broadcast_idf:
        dfreq = F.broadcast(tc.groupBy("term").agg(F.count(F.lit(1)).alias("dfc")))
        scored = tc.join(dfreq, "term")
    else:
        scored = tc.withColumn("dfc", F.count(F.lit(1)).over(Window.partitionBy("term")))
    wlen = Window.partitionBy("id")
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("len", F.sum("c").over(wlen))
        .crossJoin(F.broadcast(n))
        .select("id", "term", score.alias("tfidf"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .withColumnRenamed("id", id_col)
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    quotas: dict,
    prefilter: bool = False,
) -> DataFrame:
    """Exact count-quota mixture sampling — "assemble a corpus of
    exactly N docs at 50% web / 30% books / 20% code": for each
    stratum, keep the first ``quotas[stratum]`` rows in deterministic
    md5-of-id order (ties by id). Strata absent from ``quotas`` are
    dropped. Reproducible across engines/runs/retries, and exact where
    ``stratified_sample`` is rate-based.

    Scale path (``prefilter=True``): ranking a petabyte stratum
    through one window partition is the bottleneck, so first cut each
    stratum to ~2x its quota with the md5-prefix trick (per-stratum
    threshold from one broadcast count aggregate — md5 is uniform, so
    the cut keeps a superset of the winners with overwhelming margin),
    then rank only the survivors. ``test_mixture_prefilter_equal``
    pins both paths identical on real data."""
    h = F.md5(F.col(id_col).cast("string"))
    quota_pairs = [x for kv in quotas.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    quota = F.create_map(*quota_pairs)[F.col(strata_col)]
    src = df.filter(F.col(strata_col).isin(list(quotas)))
    if prefilter:
        cols = src.columns
        counts = src.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__cnt"))
        src = src.join(F.broadcast(counts), strata_col)
        # two-hex-char cutoff keeping ~2x the quota plus additive slack
        # (the relative margin concentrates for big strata, the +16
        # covers small ones); "zz" sorts above every hex digram =
        # keep-all when the margin covers the whole stratum
        frac256 = F.ceil(F.lit(256.0) * (2 * quota + 16) / F.col("__cnt"))
        thr = F.when(frac256 >= 256, F.lit("zz")).otherwise(
            F.lower(F.lpad(F.conv(frac256.cast("string"), 10, 16), 2, "0"))
        )
        src = src.filter(F.substring(h, 1, 2) < thr).select(*cols)
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        src.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= quota)
        .drop("__rk")
    )


def phrase_count(text: Column, phrase: str) -> Column:
    """Exact positional phrase-occurrence count (the capability BM25's
    bag-of-words ranking can't express): number of token positions
    where the document's consecutive words equal ``phrase``. Pure
    codegen'd array expression over the scan — zero shuffles; at
    100 TB this is a map-only filter stage."""
    terms = phrase.split(" ")
    n = len(terms)
    ws = words(text)
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(ws, i + k) for k in range(n)])  # noqa: E731
    hits = F.size(F.filter(F.transform(idx, gram), lambda g: g == F.lit(phrase)))
    return F.when(F.size(ws) >= n, hits).otherwise(F.lit(0))


def normalize_text(text: Column) -> Column:
    """C4-style normalization for robust exact dedup: lowercase,
    punctuation -> space, whitespace runs collapsed, trimmed. Pure
    codegen'd expression ([\\p{Punct}] and RE2's [[:punct:]] agree on
    the ASCII punctuation set, keeping oracles value-exact)."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[\p{Punct}]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def weighted_sample(
    df: DataFrame, weight_col: str, id_col: str, n: int
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis):
    each row races with an exponential key -ln(u)/w where u derives
    from md5(id) — deterministic AND engine-neutral (a rand()-keyed
    sample could never be value-checked), inclusion probability
    proportional to weight. The n winners come from a distributed
    TakeOrdered (per-partition top-n, no global sort). Weights must
    be positive."""
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    u = (F.conv(h, 16, 10).cast("double") + 1.0) / 4294967296.0
    key = -F.log(u) / F.col(weight_col)
    return (
        # enforce positive weights: a NULL/zero/negative weight would
        # produce a NULL or negative key and JUMP the sample queue
        # (orderBy puts nulls first)
        df.filter(F.col(weight_col) > 0)
        .withColumn("__k", key)
        .orderBy("__k", id_col)
        .limit(n)
        .drop("__k")
    )


def split_assign(
    df: DataFrame, id_col: str, fractions: "dict[str, float] | None" = None
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5-uniform of the
    id falls into cumulative fraction bands (insertion order of
    ``fractions``). Reproducible across engines/runs/retries — a doc
    can never silently migrate between splits on a retry, and the
    assignment is value-checkable in SQL. Adds a ``split`` column."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        / 4294967296.0
    )
    expr, acc = None, 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        acc += frac
        expr = (F.when(u < acc, name) if expr is None else expr.when(u < acc, name))
    label = expr.otherwise(items[-1][0]) if expr is not None else F.lit(items[-1][0])
    return df.withColumn("split", label)


def compression_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Gopher-style compression-ratio quality signal: highly
    compressible text (ratio near 0) is repetitive boilerplate,
    incompressible text (near 1) is word salad or binary junk —
    natural prose sits in between. zlib runs per Arrow batch inside a
    pandas UDF (the only text operator that genuinely needs Python —
    there is no codegen DEFLATE); payload never shuffles. Output:
    (id, n_bytes, n_compressed, compress_ratio 4dp)."""
    import zlib

    def run(batches):
        for pdf in batches:
            nb, nc, ratio = [], [], []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                z = len(zlib.compress(raw, level))
                nb.append(len(raw))
                nc.append(z)
                ratio.append(round(z / len(raw), 4) if raw else None)
            out = pdf[[id_col]].copy()
            out["n_bytes"] = nb
            out["n_compressed"] = nc
            out["compress_ratio"] = ratio
            yield out

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, n_bytes long, n_compressed long, compress_ratio double",
    )


def canonical_url(url: Column) -> Column:
    """Crawl-dedup URL canonicalization as one codegen expression:
    drop the fragment, lowercase scheme+authority, strip default
    ports (:80 http / :443 https), strip trailing path slashes.
    'HTTPS://Example.com:443/a/' and 'https://example.com/a' collapse
    to the same canonical form — the normalization every URL-keyed
    dedup/frontier runs before hashing."""
    u = F.regexp_replace(url, "#.*$", "")
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    prefix = F.lower(auth)
    rest = F.substring(u, F.length(auth) + 1, F.lit(1 << 30))
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]+):443$", "$1")
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]+):80$", "$1")
    rest = F.regexp_replace(rest, "/+$", "")
    return F.concat(prefix, rest)


def pmi_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over
    adjacent word pairs:

        pmi(a, b) = ln( (c(ab) / N) / ((c(a)/N) * (c(b)/N)) )

    with N = total bigram occurrences and unigram probabilities from
    the same windowed counts (standard collocation-mining setup);
    ``min_count`` suppresses the low-frequency noise PMI is infamous
    for. Rounded-then-ranked (pmi desc, bigram asc) so the top-k is
    engine-neutral. Output: (bigram, n, pmi, rank).

    Scale shape: two map-side-combined count aggregates (bigram,
    unigram), a join keyed on the bigram's words, one broadcast
    scalar, and a depth-k TakeOrdered — no global sort."""
    ws = F.split(F.col(text_col), " ")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bi = (
        df.select(F.explode(F.when(F.size(ws) >= 2, bigrams).otherwise(F.array())).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    uni = (
        df.select(F.explode(ws).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = bi.agg(F.sum("n").alias("nn"))  # 1-row broadcast scalar
    a = F.substring_index("bg", " ", 1)
    b = F.substring_index("bg", " ", -1)
    ua = uni.select(F.col("w").alias("__a"), F.col("cu").alias("ca"))
    ub = uni.select(F.col("w").alias("__b"), F.col("cu").alias("cb"))
    pmi = F.round(
        F.log(
            (F.col("n") * F.col("nn").cast("double"))
            / (F.col("ca").cast("double") * F.col("cb"))
        ),
        6,
    )
    scored = (
        bi.filter(F.col("n") >= min_count)
        .withColumn("__a", a)
        .withColumn("__b", b)
        .join(F.broadcast(ua), "__a")
        .join(F.broadcast(ub), "__b")
        .crossJoin(F.broadcast(tot))
        .select("bg", "n", pmi.alias("pmi"))
    )
    # depth-k list ranked by sorting the single coalesced partition
    # (monotonically_increasing_id is consecutive there) — identical
    # to a global row_number window without the WindowExec warning
    return (
        scored.orderBy(F.desc("pmi"), F.asc("bg"))  # TakeOrdered cut
        .limit(k)
        .coalesce(1)
        .sortWithinPartitions(F.desc("pmi"), F.asc("bg"))
        .select(
            F.col("bg").alias("bigram"),
            "n",
            "pmi",
            (F.monotonically_increasing_id() + 1).cast("long").alias("rank"),
        )
    )


def chi2_terms(
    df: DataFrame,
    strata_col: str,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 3,
) -> DataFrame:
    """Distinctive terms per stratum by chi-square: for each
    (stratum, term), the 2x2 contingency of term-occurrence vs
    stratum-membership over token positions,

        chi2 = N * (a*d - b*c)^2 / ((a+b)(c+d)(a+c)(b+d))

    — the classic feature-selection signal ("what words make this
    source different"). Ranked (chi2 desc 4dp, term asc) per stratum;
    ``min_count`` floors a. All counts come from two
    map-side-combined aggregates + broadcast totals; the top-k window
    partitions by stratum (parallel). Output:
    (stratum, term, n, chi2, rank)."""
    toks = df.select(
        F.col(strata_col).alias("s"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    st = toks.groupBy("s", "term").agg(F.count(F.lit(1)).alias("a"))
    ct = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cterm"))
    cs = toks.groupBy("s").agg(F.count(F.lit(1)).alias("cstr"))
    n = toks.agg(F.count(F.lit(1)).alias("nn"))
    a = F.col("a").cast("double")
    b = (F.col("cterm") - F.col("a")).cast("double")
    c = (F.col("cstr") - F.col("a")).cast("double")
    d = (F.col("nn") - F.col("cterm") - F.col("cstr") + F.col("a")).cast("double")
    chi2 = F.round(
        (F.col("nn") * (a * d - b * c) * (a * d - b * c))
        / ((a + b) * (c + d) * (a + c) * (b + d)),
        4,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.desc("chi2"), F.asc("term"))
    return (
        st.filter(F.col("a") >= min_count)
        .join(F.broadcast(ct), "term")
        .join(F.broadcast(cs), "s")
        .crossJoin(F.broadcast(n))
        .select(F.col("s").alias(strata_col), "term", F.col("a").alias("n"), chi2.alias("chi2"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def frequent_units(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    min_df: int = 2,
    max_dict: int = 100_000,
) -> list[str]:
    """The corpus's boilerplate unit dictionary: every ``sep``-split
    unit (line, sentence, word — caller's choice of separator)
    appearing in >= ``min_df`` DISTINCT documents. Bounded driver
    materialization: boilerplate is the head of the frequency
    distribution, so the dictionary is small by construction; the
    limit(n+1)-and-raise guard makes that assumption explicit instead
    of silently collecting an unbounded set."""
    import re as _re

    # sep is a LITERAL separator (it is also the reassembly joiner):
    # escape it for split's regex argument
    units = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), _re.escape(sep), -1)))
        .alias("u"),
    ).where(F.col("u") != "")
    freq = (
        units.groupBy("u")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    rows = freq.select("u").limit(max_dict + 1).collect()
    if len(rows) > max_dict:
        raise ValueError(
            f"frequent_units: more than {max_dict} units with df >= "
            f"{min_df} — raise min_df (this threshold is meant to catch "
            "the head of the distribution, not half the vocabulary) or "
            "raise max_dict"
        )
    return sorted(r["u"] for r in rows)


def remove_frequent_units(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    min_df: int = 2,
    units: list[str] | None = None,
    out_col: str | None = None,
    max_dict: int = 100_000,
) -> DataFrame:
    """C4-style corpus boilerplate REMOVAL: drop every ``sep``-split
    unit that occurs in >= ``min_df`` distinct documents (navigation
    chrome, cookie banners, templated disclaimers when units are
    lines), reassembling the remaining units in their original order.
    Adds ``out_col`` (default ``<text_col>_clean``) plus
    ``n_units`` / ``n_removed`` accounting columns.

    Scale shape: ONE aggregation job builds the (small, guarded)
    dictionary; the rewrite is zero-shuffle either way — the corpus is
    never exploded, never reassembled through a groupBy. Small
    dictionaries (<= 32 units) rewrite with a codegen'd
    filter-over-split against an array literal; larger ones switch to
    an Arrow-batched mapInPandas with an O(1) frozenset lookup,
    because the literal-array membership scan is O(dict x tokens) —
    the x100 scale probe measured the array path at 43 s on a
    3000-unit dictionary vs ~2 s for the set path. Pass ``units`` to
    reuse a dictionary across corpora (e.g. train the line blocklist
    on a sample, apply to the full crawl)."""
    if units is None:
        units = frequent_units(df, text_col, id_col, sep, min_df, max_dict)
    import re as _re

    out_col = out_col or f"{text_col}_clean"
    if len(units) <= 32:
        lit_units = (
            F.array(*[F.lit(u) for u in units])
            if units
            else F.array().cast("array<string>")
        )
        parts = F.split(F.col(text_col), _re.escape(sep), -1)
        kept = F.filter(
            parts,
            lambda u: (u != "") & ~F.array_contains(lit_units, u),
        )
        n_units = F.size(F.filter(parts, lambda u: u != ""))
        return df.withColumn(out_col, F.concat_ws(sep, kept)).withColumn(
            "n_units", n_units.cast("long")
        ).withColumn("n_removed", (n_units - F.size(kept)).cast("long"))

    import pandas as pd

    drop = frozenset(units)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.StringType()),
            T.StructField("n_units", T.LongType()),
            T.StructField("n_removed", T.LongType()),
        ]
    )

    def rewrite(batches):
        for pdf in batches:
            cleans, n_us, n_rs = [], [], []
            for t in pdf[text_col]:
                ps = [p for p in (t.split(sep) if t else []) if p != ""]
                kept = [p for p in ps if p not in drop]
                cleans.append(sep.join(kept))
                n_us.append(len(ps))
                n_rs.append(len(ps) - len(kept))
            pdf = pdf.copy()
            pdf[out_col] = cleans
            pdf["n_units"] = pd.Series(n_us, dtype="int64")
            pdf["n_removed"] = pd.Series(n_rs, dtype="int64")
            yield pdf

    return df.mapInPandas(rewrite, out_schema)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    budgets: dict,
    text_col: str = "text",
) -> DataFrame:
    """TOKEN-budget mixture sampling — "assemble 1B web tokens + 200M
    code tokens": for each stratum, walk rows in deterministic
    md5-of-id order and keep them while the running token total stays
    <= the stratum's budget (whitespace tokens; the row that would
    cross the budget is dropped, so the kept total never exceeds it).
    The count-quota sibling is ``mixture_sample``; this one is what a
    training-data order actually specifies. Strata absent from
    ``budgets`` are dropped. Adds ``n_tok`` and ``cum_tok``.

    Scale shape: one window per stratum (ordered cumulative sum —
    sort-based, spills); for petabyte strata apply the same md5-prefix
    prefilter idea as mixture_sample (cut to ~budget/avg_tokens * 2
    rows first) before ranking."""
    from pyspark.sql import Window

    budget_pairs = [x for kv in budgets.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    budget = F.create_map(*budget_pairs)[F.col(strata_col)]
    src = df.filter(F.col(strata_col).isin(list(budgets)))
    h = F.md5(F.col(id_col).cast("string"))
    n_tok = F.size(F.filter(F.split(F.col(text_col), " ", -1), lambda t: t != ""))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        src.withColumn("n_tok", n_tok.cast("long"))
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") <= budget)
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 4096,
    n: int = 100,
    round_dp: int = 4,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    score every RAW document by the bigram log-likelihood ratio
    between a target-domain model and the raw-corpus model,

        w(doc) = sum over the doc's vocab bigrams of
                 ln((c_tgt(b)+1)/(T_tgt+V)) - ln((c_raw(b)+1)/(T_raw+V))

    with add-one smoothing over a capped vocabulary — the ``vocab_size``
    most frequent raw bigrams, ties by bigram string. The paper's
    hashed feature space is replaced by this explicit deterministic
    vocab and its Gumbel resampling by top-``n`` on (rounded weight
    desc, id), so the whole decision chain replays in SQL (gate
    text_dsir_select). Documents containing no vocab bigram are not
    scored (no evidence either way).

    Scale shape: explode/groupBy/join all codegen'd; the vocab is a
    TakeOrdered over bigram counts (driver-bounded at vocab_size) that
    broadcasts into the scoring join; the only corpus-sized shuffles
    key on bigram strings and doc ids. Top-n is TakeOrderedAndProject,
    never a single-partition window. No Python anywhere.
    """

    def bg(df: DataFrame) -> DataFrame:
        ws = F.split(F.col(text_col), " ")
        pairs = F.zip_with(
            F.slice(ws, 1, F.size(ws) - 1),
            F.slice(ws, 2, F.size(ws) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        return df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("b"))

    raw_bg = bg(raw)
    vocab = (
        raw_bg.groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "b")
        .limit(vocab_size)
    )
    tgtc = bg(target).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    v = vocab.join(tgtc, "b", "left").na.fill({"ct": 0})
    tot = v.agg(
        F.sum("c").alias("rt"), F.sum("ct").alias("tt"), F.count(F.lit(1)).alias("vn")
    )
    lw = F.log((F.col("ct") + 1.0) / (F.col("tt") + F.col("vn"))) - F.log(
        (F.col("c") + 1.0) / (F.col("rt") + F.col("vn"))
    )
    w = v.crossJoin(F.broadcast(tot)).select("b", lw.alias("lw"))
    scored = (
        raw_bg.join(F.broadcast(w), "b")
        .groupBy("id")
        .agg(F.round(F.sum("lw"), round_dp).alias("weight"))
    )
    return (
        scored.orderBy(F.desc("weight"), "id")
        .limit(n)
        .select(F.col("id").alias(id_col), "weight")
    )


def curation_report(
    df: DataFrame,
    id_col: str,
    rules: "list[tuple[str, callable]]",
) -> DataFrame:
    """Per-document curation LINEAGE: run an ordered chain of drop
    rules and report, for every input document, whether it survived
    and which rule removed it — the audit artifact a training-data
    pipeline needs ("why is this doc not in the training set?") and
    the one a bare filter chain destroys.

    ``rules`` is an ordered list of ``(name, fn)`` where
    ``fn(survivors: DataFrame) -> DataFrame`` returns the ids to drop
    (any 1+-column frame containing ``id_col``). Semantics are
    SEQUENTIAL: rule i sees only the survivors of rules < i — this is
    how real pipelines run, and it matters for corpus-dependent rules
    (a keep-smallest dedup rule must not count a document already
    removed by an earlier rule as a cluster's keeper).

    Output: one row per input document — (id, kept boolean,
    dropped_by string) with ``dropped_by`` NULL for survivors.

    Scale shape: each stage is ONE left-anti join on the id; each
    rule's drop set is pinned with an eager localCheckpoint — drop
    sets are id-only (8 bytes/row), tiny next to the corpus, and
    without the pin stage k's evaluation would recompute every earlier
    rule's full lineage (rule fns can be arbitrarily expensive — LSH
    passes, gram joins). The corpus itself never shuffles; the final
    report is a left join of the input ids against the unioned drop
    labels.
    """
    from functools import reduce

    if not rules:
        raise ValueError("curation_report needs at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    survivors = df
    labeled = []
    for name, fn in rules:
        drops = (
            fn(survivors)
            .select(id_col)
            .distinct()
            .localCheckpoint(eager=True)  # id-only: bounded by construction
        )
        labeled.append(drops.withColumn("dropped_by", F.lit(name)))
        survivors = survivors.join(drops, on=id_col, how="left_anti")
    all_drops = reduce(lambda a, b: a.unionByName(b), labeled)
    return (
        df.select(id_col)
        .join(all_drops, on=id_col, how="left")
        .select(
            id_col,
            F.col("dropped_by").isNull().alias("kept"),
            "dropped_by",
        )
    )


def curation_flags(
    df: DataFrame,
    id_col: str,
    rules: "list[tuple[str, tuple]]",
) -> DataFrame:
    """:func:`curation_report` for DECLARATIVE rules, fused into ONE
    plan — same output contract (one row per input doc: id, kept,
    dropped_by; sequential first-rule-wins attribution) without the
    per-rule eager-materialization barriers the opaque-callable API
    needs. Five serial Spark jobs become one: every rule's flag is a
    column, attribution is a single when-chain, and independent rule
    subtrees (the decontamination gram join, the dedup window) run
    CONCURRENTLY inside one job instead of as a driver-sequenced
    chain. At any scale the serial barrier count — not the per-rule
    work — is what this removes.

    ``rules`` is an ordered list of ``(name, spec)``; spec is one of:

    - ``("pred", Column)`` — a POINTWISE drop predicate (depends only
      on the row and external constants). Evaluated over the full
      input; first-rule-wins attribution reproduces the sequential
      semantics exactly, because a pointwise predicate fires on a
      survivor iff it fires on the raw row.
    - ``("dup_keep_smallest", Column)`` — drop every row that is not
      the minimum-id member of its group (group key = the Column)
      among rows NOT dropped by the earlier rules. The corpus-
      dependent keep-smallest dedup rule, fused as one conditional
      window (min(when(survivor, id)) over key) instead of a
      checkpointed groupBy + anti-join.
    - ``("drop_ids", DataFrame)`` — a drop-id frame computed
      INDEPENDENTLY of the survivor chain (e.g. full-corpus
      decontamination against an external benchmark set). The frame
      must be a per-doc decision: evaluated on the full corpus it may
      include docs an earlier rule already dropped (attribution keeps
      the earlier rule — identical to the sequential chain), but it
      must contain every survivor the sequential rule would drop.
      Joined once on ``id_col`` (broadcast when small).

    Scale shape: one corpus pass for the flag chain, one window
    shuffle per dup rule, one id-join per drop_ids rule; no
    localCheckpoint barriers, no recomputation of earlier rules'
    lineage."""
    if not rules:
        raise ValueError("curation_flags needs at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    out = df
    flag_cols: list[str] = []
    for i, (name, spec) in enumerate(rules):
        kind, payload = spec
        flag = f"__drop_{i}"
        if kind == "pred":
            out = out.withColumn(flag, F.coalesce(payload, F.lit(False)))
        elif kind == "dup_keep_smallest":
            from pyspark.sql import Window

            key = f"__key_{i}"
            survivor = ~reduce_or([F.col(c) for c in flag_cols])
            out = out.withColumn(key, payload)
            w = Window.partitionBy(key)
            keeper = F.min(F.when(survivor, F.col(id_col))).over(w)
            out = out.withColumn(
                flag, survivor & (F.col(id_col) != keeper)
            ).drop(key)
        elif kind == "drop_ids":
            # the frame's single column IS the id list; a wider frame
            # would silently join on whatever column happens to lead
            # (ADVICE r15) — refuse instead of guessing
            if len(payload.columns) != 1:
                raise ValueError(
                    f"drop_ids rule {name!r} expects a single-column "
                    f"id frame, got columns {payload.columns}; select "
                    "the id column explicitly"
                )
            ids = payload.select(
                F.col(payload.columns[0]).alias(id_col)
            ).distinct()
            out = out.join(
                ids.withColumn(flag, F.lit(True)), id_col, "left"
            ).withColumn(flag, F.coalesce(F.col(flag), F.lit(False)))
        else:
            raise ValueError(f"unknown rule kind {kind!r} for rule {name!r}")
        flag_cols.append(flag)

    dropped = F.lit(None).cast("string")
    for name, flag in zip(reversed(names), reversed(flag_cols)):
        dropped = F.when(F.col(flag), F.lit(name)).otherwise(dropped)
    return out.select(
        id_col,
        dropped.isNull().alias("kept"),
        dropped.alias("dropped_by"),
    )


def reduce_or(cols: "list[Column]") -> Column:
    """OR-fold a column list; empty -> lit(False)."""
    from functools import reduce

    if not cols:
        return F.lit(False)
    return reduce(lambda a, b: a | b, cols)
