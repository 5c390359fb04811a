"""Shared plan/execution helpers for operator-internal driver actions."""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def no_adaptive(spark):
    """Run a BOUNDED operator-internal driver action (a <= k-row
    collect, an eager count over an explicitly-partitioned narrow
    frame) without adaptive query execution.

    Why: AQE executes every exchange below an action as its OWN Spark
    job (stage-wise re-planning), so a bounded 2-exchange collect pays
    2-5 rounds of job-scheduling latency instead of one. For these
    sub-queries AQE has nothing to re-optimize at ANY data scale — the
    partitioning is explicit (repartition/repartitionByRange/mapInPandas
    passes), the only joins are static broadcasts, and the output is
    bounded by construction — so the extra barriers are pure overhead,
    on a real cluster more than locally (scheduler round-trips).
    Measured r16 (sf0.1, warm, local[32]): dedup-index bucket collects
    2 jobs -> 1, 1.09s -> 0.33s; global_rank counts 5 jobs -> 2,
    0.83s -> 0.37s; minhash feature-cache count 4 jobs -> 1,
    1.74s -> 1.27s.

    Do NOT wrap corpus-shaped work: AQE's partition coalescing and
    join re-planning are load-bearing there (measured r16: the
    connected-components round counts regress 0.3s -> 3.2s without
    AQE at sf0.1 — 32-way tiny-partition stages).

    The flag is session-scoped, so a query COMPILED concurrently on
    another driver thread (async index folds) would also execute
    non-adaptively — a transient perf effect on background work, never
    a correctness one; the flag is always restored.
    """
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
