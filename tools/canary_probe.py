"""Canary-floor measurement protocol (VERDICT r11 #1).

The check_bench canary normalization divides every query's floor ratio
by the canary's floor ratio — which only works while the canary floor
is achievable on the CURRENT machine epoch. r11 showed the hazard: the
q01 floor (0.268s) came from an older, faster box epoch; even idle
fast-phase sessions measured ~0.45-0.51s with the plan verified optimal
against a raw-parquet rewrite, so every canary-normalized check ran
with an inflated denominator and the per-query regression gate was
looser than designed.

Protocol (run this whenever the canary ratio reads >1.5x across
multiple sessions with no code change):

    for i in 1 2 3; do python tools/canary_probe.py; done

Each invocation is a FRESH JVM/session (the epoch is a machine
property, so separate processes sample it honestly) that replays
bench.py's warm-up and measures the canary BASKET min-of-5. Take the
per-query MIN ACROSS the >= 3 sessions as the new floors, update
BENCH_FLOOR.json, and note the re-base in its comment.

The basket (q01 scan-agg, q02 pushdown scan, q_agg_stats multi-agg) is
what tools/check_bench.py normalizes phase with — the median of three
ratios, so one query's bad luck no longer masquerades as a slow phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from shc_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402

BASKET = ["q01_pricing_summary", "q02_filter_scan", "q_agg_stats"]
REPS = int(os.environ.get("SPARK_GRAFT_CANARY_REPS", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    from shc_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("canary_probe")

    def run(name: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # bench.py's warm-up, replayed so the probe measures the same state
    run("q06_forecast_revenue")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 64, 1, 32).select(_warm("id")).write.mode("overwrite").format(
        "noop"
    ).save()

    out = {}
    for name in BASKET:
        out[name] = round(min(run(name) for _ in range(REPS)), 3)
    print(json.dumps({"canary_basket": out, "reps": REPS, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
