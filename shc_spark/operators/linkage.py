"""Record linkage (entity resolution) via blocked fuzzy matching.

A training-corpus curation primitive the reference does not have
(beyond-reference, per the build brief): find records whose *names*
(or any short string key) differ by small edit distance — OCR noise,
typos, vendor-feed variants — without the O(n^2) all-pairs scan.

Scale design (100 TB lens):
- match on the DISTINCT value dictionary first: at corpus scale the
  vocabulary of a name-like column is orders of magnitude smaller than
  the row count, so the quadratic-ish candidate step runs on the
  dictionary, never the records;
- blocking bounds the candidate set (default block = first token;
  any deterministic Column expression works — soundex, prefix, ...).
  NOTE: for SINGLE-token values the default block IS the whole value,
  so no fuzzy pairs can form — pass an explicit block (e.g.
  ``F.substring(F.col(c), 1, 3)``) for one-word dictionaries;
- a length-band prune (|len(a)-len(b)| <= max_dist) is applied before
  levenshtein — edit distance is bounded below by the length gap, so
  this is a free, lossless cut that keeps the expensive comparison off
  most candidates;
- levenshtein itself is a codegen'd JVM builtin (no Python in the
  loop), and record attachment is a broadcast join of the small match
  dictionary back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _blocked(df: DataFrame, col: str, block: Column | None) -> DataFrame:
    """Distinct values of ``col`` with their blocking key."""
    blk = block if block is not None else F.split_part(F.col(col), F.lit(" "), F.lit(1))
    return df.select(col).where(F.col(col).isNotNull()).distinct().withColumn("__blk", blk)


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    block: Column | None = None,
    min_dist: int = 1,
    max_dist: int = 3,
) -> DataFrame:
    """All pairs of DISTINCT ``col`` values within a block whose edit
    distance lies in [min_dist, max_dist].  Output columns:
    (name_a, name_b, dist) with name_a < name_b.

    min_dist=1 excludes exact duplicates (those are ``exact_dedup``'s
    job); raise max_dist for noisier sources.
    """
    a = _blocked(df, col, block).toDF("name_a", "__blk")
    b = _blocked(df, col, block).toDF("name_b", "__blk")
    cand = a.join(b, "__blk").where(
        (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.withColumn("dist", dist.cast("long"))
        .where(F.col("dist").between(min_dist, max_dist))
        .select("name_a", "name_b", "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    block: Column | None = None,
    max_dist: int = 3,
) -> DataFrame:
    """Link two tables on approximately-equal string keys: every
    (left value, right value) dictionary pair within ``max_dist``
    (including 0 — cross-table linkage wants exact hits too).
    Output: (left value, right value, dist), one row per distinct
    value pair; broadcast-join it back onto either table to attach
    full records.  When both sides use the SAME column name the output
    disambiguates to ``<name>_left`` / ``<name>_right`` (the two sides
    are aliased to internal names before the join, so same-name inputs
    never hit an ambiguous-reference error).
    """
    lb = block if block is not None else F.split_part(F.col(left_col), F.lit(" "), F.lit(1))
    rb = block if block is not None else F.split_part(F.col(right_col), F.lit(" "), F.lit(1))
    a = (
        left.select(left_col).where(F.col(left_col).isNotNull()).distinct()
        .select(F.col(left_col).alias("__l"), lb.alias("__blk"))
    )
    b = (
        right.select(right_col).where(F.col(right_col).isNotNull()).distinct()
        .select(F.col(right_col).alias("__r"), rb.alias("__blk"))
    )
    cand = a.join(b, "__blk").where(
        F.abs(F.length("__l") - F.length("__r")) <= max_dist
    )
    dist = F.levenshtein("__l", "__r")
    out_l, out_r = left_col, right_col
    if out_l == out_r:
        out_l, out_r = f"{left_col}_left", f"{right_col}_right"
    return (
        cand.withColumn("dist", dist.cast("long"))
        .where(F.col("dist") <= max_dist)
        .select(F.col("__l").alias(out_l), F.col("__r").alias(out_r), "dist")
    )


def canonicalize(
    df: DataFrame,
    col: str,
    block: Column | None = None,
    max_dist: int = 3,
) -> DataFrame:
    """Map every distinct ``col`` value to a canonical representative:
    the MIN value of its fuzzy-match connected component (values with
    no fuzzy neighbor map to themselves).  Output: (value, canonical).

    Broadcast-join the result back onto the corpus to rewrite the
    column; the component step runs on the value dictionary only.
    """
    from shc_spark.operators.dedup import connected_components

    pairs = fuzzy_pairs(df, col, block=block, min_dist=1, max_dist=max_dist)
    comp = connected_components(pairs, "name_a", "name_b")  # (id, cluster)
    names = df.select(F.col(col).alias("value")).where(F.col("value").isNotNull()).distinct()
    return (
        names.join(F.broadcast(comp), names.value == comp.id, "left")
        .select("value", F.coalesce("cluster", "value").alias("canonical"))
    )


def normalized_key(text: Column, length: int = 24) -> Column:
    """The RECOMMENDED cheap SNM sort/blocking key: lowercase, ASCII
    punctuation deleted, tab/newline folded to space, first ``length``
    chars. Built entirely from ``translate`` — a codegen'd byte-table
    lookup that streams at memory speed — because the key expression
    is where naive SNM callers lose their wall: java regex evaluates
    at ~10 MB/s, and the equivalent ``regexp_replace`` cleaning key
    measured 23s vs this key's 1.0s over the same 500k-doc corpus
    (SCALE.md, r12). The key feeds a SORT, so it only needs to be a
    deterministic normalization, not an exact text rewrite — non-ASCII
    symbols pass through unchanged (they still order consistently),
    and whitespace runs are left uncollapsed (run length is itself a
    stable sort feature).
    """
    import string

    junk = "\t\n\r" + string.punctuation
    t = F.translate(F.lower(F.coalesce(text, F.lit(""))), junk, "   ")
    return F.substring(t, 1, length)


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
    eager: bool = False,
    allow_wide_cache: bool = False,
) -> DataFrame:
    """0-based global rank by ``order_cols`` WITHOUT the
    single-partition window a bare ``row_number() OVER (ORDER BY ...)``
    plans (which serializes the whole corpus through one task — the
    classic 100-TB killer).

    Shape: one range shuffle (the sort every global rank needs anyway),
    then a tiny per-partition count collect (#partitions rows) and a
    second pass that adds offset + local position inside mapInPandas —
    no second corpus shuffle. The partitioned frame is persisted so
    both passes see the SAME range boundaries (repartitionByRange
    samples; an unpersisted recompute could draw different bounds and
    misalign the offsets).

    Cache contract (the persist is load-bearing, so it has teeth):

    - **Project first.** The WHOLE input frame is cached across the two
      passes, so a wide 100-TB corpus must not be passed directly —
      select ``order_cols`` + a unique id, rank that, and broadcast/
      join the payload back by id.  Inputs wider than ``order_cols``
      plus 2 payload columns raise unless ``allow_wide_cache=True``.
    - **Lifetime.** With ``eager=False`` (default) the result stays
      lazy and the cached frame lives until the session ends or the
      caller materializes + forgets it — fine for one-shot jobs, a
      leak if called in a loop.  ``eager=True`` localCheckpoints the
      (narrow) result and unpersists the staging cache before
      returning, so nothing outlives the call.

    ``order_cols`` must be a total order (append a unique id as the
    last column) or equal rows get arbitrary-but-disjoint ranks within
    their tie group.

    NOTE: ``repartitionByRange`` SAMPLES its input before shuffling it,
    so any expensive expression feeding ``df`` (a regex-normalized sort
    key, a decoded column) evaluates twice over the corpus — pre-pin it
    (``localCheckpoint``) like :func:`snm_pairs` does.
    """
    from pyspark import StorageLevel
    from pyspark.sql.types import LongType, StructField, StructType

    extra = [c for c in df.columns if c not in order_cols]
    if len(extra) > 2 and not allow_wide_cache:
        raise ValueError(
            f"global_rank caches its whole input across two passes; got "
            f"{len(extra)} payload columns beyond order_cols ({extra[:5]}...). "
            "Project to order_cols + a unique id first and join the payload "
            "back by id, or pass allow_wide_cache=True if the frame is small."
        )

    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # non-adaptive bounded collect (planutil.no_adaptive): the subtree
    # is an EXPLICITLY range-partitioned sort + a #partitions-row
    # count — AQE cannot coalesce a user-specified partitioning and
    # only adds one stage-job barrier per exchange (measured r16:
    # 5 jobs -> 2, 0.83s -> 0.37s warm at sf0.1; the range sampling
    # pass is one of the two either way)
    from shc_spark.operators.planutil import no_adaptive

    with no_adaptive(df.sparkSession):
        counts = {r["__pid"]: r["cnt"] for r in
                  parted.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # fresh StructType — StructType.add mutates in place, which would
    # plant a phantom rank field in the CALLER's cached df.schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(rank_col, LongType(), False)]
    )

    def assign(it):
        seen = 0
        for pdf in it:
            pid = int(pdf["__pid"].iloc[0])
            base = offsets[pid] + seen
            seen += len(pdf)
            pdf = pdf.drop(columns=["__pid"])
            pdf[rank_col] = range(base, base + len(pdf))
            yield pdf

    ranked = parted.mapInPandas(assign, schema=out_schema)
    if eager:
        ranked = ranked.localCheckpoint(eager=True)
        parted.unpersist(blocking=False)
    return ranked


def snm_pairs(
    df: DataFrame,
    key: Column,
    window: int,
    id_col: str,
    pre_pinned: bool = False,
) -> DataFrame:
    """Sorted-neighborhood method (Hernandez & Stolfo 1995): sort the
    corpus by a fuzzy blocking key and emit every pair within a
    sliding window of ``window`` consecutive rows — the classic
    entity-resolution alternative to LSH blocking (catches near-dups
    whose edits fall OUTSIDE a fixed block prefix, because sorting
    places them adjacently).

    Scale shape: global_rank (one range shuffle, no single-partition
    window), then pairing as a pure EQUI-join on rank//window blocks —
    each left row probes its own and the next block, so no range join,
    no cartesian. Output: (id_a, id_b, rank_a, rank_b) with
    rank_a < rank_b < rank_a + window; attach payload/similarity by
    joining ids back to the corpus.

    KEY-COST HAZARD (measured, SCALE.md r12): the rank + block-join
    machinery is near-flat (~3s at 500k rows), so the operator's
    practical wall is the CALLER's ``key`` expression — a
    regexp_replace normalization key evaluates at java-regex speed
    (~10 MB/s, 23s over the 500k-doc probe corpus) while the
    translate-based :func:`normalized_key` does the same job in 1.0s.
    Use ``normalized_key(col)`` unless you have a reason not to.

    ``pre_pinned=True`` (r16) skips the internal localCheckpoint: pass
    it when ``df`` is already pinned (localCheckpoint/cache) AND
    ``key`` is cheap over it (a substring/cast, not a fresh regex) —
    the caller that computes an expensive normalization ONCE and
    derives both the SNM key and its own probe columns from the
    pinned frame saves one corpus pass plus one checkpoint job.
    """
    if window < 2:
        raise ValueError("snm window must be >= 2")
    # Pin the (id, key) projection BEFORE ranking: repartitionByRange
    # samples its input and then shuffles it, so an expensive key
    # expression (SNM keys are typically regex/normalization over the
    # text — java regex measured ~10 MB/s) would evaluate TWICE over
    # the corpus. The projection is narrow (id + short key), so the
    # checkpoint is corpus-cheap and the key computes exactly once.
    # (r12: the r11 probe's "near-flat" SNM curve was an artifact of
    # global_rank's since-fixed cache leak — rep 2 of the min-of-2
    # probe silently read rep 1's leaked cache.)
    proj = df.select(F.col(id_col), key.alias("__snm_key"))
    if not pre_pinned:
        proj = proj.localCheckpoint(eager=True)
    # eager=True: the ranked dictionary is consumed twice (both sides
    # of the block self-join), so the localCheckpoint doubles as reuse,
    # and the staging cache inside global_rank is released immediately
    # instead of leaking one cached frame per call.
    ranked = global_rank(
        proj,
        ["__snm_key", id_col],
        rank_col="__rank",
        eager=True,
    ).select(id_col, "__rank")
    blk = (F.col("__rank") / window).cast("long")
    left = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("__rank").alias("rank_a"),
        F.explode(F.array(blk, blk + 1)).alias("__blk"),
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("__rank").alias("rank_b"),
        blk.alias("__blk"),
    )
    return (
        left.join(right, "__blk")
        .where(
            (F.col("rank_b") > F.col("rank_a"))
            & (F.col("rank_b") - F.col("rank_a") < window)
        )
        .select("id_a", "id_b", "rank_a", "rank_b")
    )
