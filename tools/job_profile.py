"""Per-query job/wall decomposition (guide §1): for each named headline
query, split the call into CONSTRUCT (the queries() callable, which may
run driver actions: collects, cache fills, index builds) and WRITE (the
noop sink), and report wall seconds plus Spark JOB COUNTS for each
phase. Job counts come from per-phase job groups via the status
tracker, so they are deterministic — walls on this box drift in
multi-minute machine phases, job counts do not.

Usage:
    python tools/job_profile.py dedup_index_query dedup_snm_pairs ...
    python tools/job_profile.py --reps 3 --all   # whole headline set

Prints one JSON line per query:
    {"query": ..., "construct_sec": ..., "construct_jobs": N,
     "write_sec": ..., "write_jobs": M, "rep_walls": [...]}
Each query is run once un-timed (warm-up: caches, JIT, index builds),
then `--reps` timed passes; the MIN wall rep is reported and job counts
are from that rep (counts are stable across reps once warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shc_spark.session import DEFAULT_SF_DIR, get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]

    from shc_spark.queries import all_queries

    queries = all_queries()
    if "--all" in sys.argv:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in queries]
    else:
        names = [n for n in queries if any(a in n for a in args)] if args else []
        names = [n for n in names if n in queries]
        # exact-name args win over substring expansion when both match
        exact = [a for a in args if a in queries]
        if exact and len(exact) == len(args):
            names = exact
    if not names:
        print("no queries matched", file=sys.stderr)
        sys.exit(2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("job_profile")
    sc = spark.sparkContext
    st = sc.statusTracker()

    def timed(name: str, rep: int):
        g1 = f"{name}-construct-{rep}"
        sc.setJobGroup(g1, g1)
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        t1 = time.time()
        g2 = f"{name}-write-{rep}"
        sc.setJobGroup(g2, g2)
        df.write.mode("overwrite").format("noop").save()
        t2 = time.time()
        sc.setJobGroup("idle", "idle")
        return (
            t1 - t0,
            len(st.getJobIdsForGroup(g1)),
            t2 - t1,
            len(st.getJobIdsForGroup(g2)),
        )

    for name in names:
        timed(name, -1)  # warm-up (index builds, caches, JIT)
        best = None
        walls = []
        for rep in range(reps):
            c_s, c_j, w_s, w_j = timed(name, rep)
            walls.append(round(c_s + w_s, 3))
            if best is None or c_s + w_s < best[0] + best[2]:
                best = (c_s, c_j, w_s, w_j)
        print(
            json.dumps(
                {
                    "query": name,
                    "construct_sec": round(best[0], 3),
                    "construct_jobs": best[1],
                    "write_sec": round(best[2], 3),
                    "write_jobs": best[3],
                    "rep_walls": walls,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
