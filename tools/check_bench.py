"""Round-over-round bench regression gate.

The reference publishes no benchmark numbers (BASELINE.md), so the
perf contract is pinned against our own best-known walls instead:
BENCH_FLOOR.json records the fastest observed per-query time at sf0.1;
this tool runs (or reads) a bench result and fails if the total or any
query regresses beyond tolerance.

Usage:
    python tools/check_bench.py                # runs bench.py fresh
    python tools/check_bench.py BENCH_r02.json # checks an existing run

Tolerances default to 1.8x on the headline total and 3.5x per query —
wide because walls on this shared box drift in multi-minute phases:
the same query measured 0.6x-3x of its best-known wall across three
back-to-back full runs with identical code (2026-08-13). A genuine
algorithmic regression (round 1's interpreted-HOF signature was 4.5x)
still trips them; the per-round BENCH_r{N} series is the
higher-signal trend.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
TOTAL_TOL = float(os.environ.get("BENCH_TOTAL_TOL", "1.8"))
QUERY_TOL = float(os.environ.get("BENCH_QUERY_TOL", "3.5"))


def main() -> int:
    with open(os.path.join(REPO, "BENCH_FLOOR.json")) as fh:
        floor = json.load(fh)

    args = [a for a in sys.argv[1:] if a != "--tpch"]
    tpch = "--tpch" in sys.argv[1:]
    if args:
        with open(args[0]) as fh:
            cur = json.load(fh)
        tpch = tpch or cur.get("metric") == "tpch22_total_wall"
    else:
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        if tpch:
            cmd.append("--tpch")
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        cur = json.loads(out.stdout.strip().splitlines()[-1])
    if tpch:
        # a tpch artifact compares against the tpch floor section
        floor = floor["tpch"]

    failures = []
    # compare like-for-like on BOTH sides when the headline set grew:
    # a new floor-less query must not count against the old total
    known = [q for q in cur["queries"] if q in floor["queries"]]
    floor_total = sum(floor["queries"][q] for q in known)
    cur_total = sum(cur["queries"][q] for q in known)
    if floor_total and cur_total > floor_total * TOTAL_TOL:
        failures.append(
            f"TOTAL {cur_total:.2f}s (floor-known queries) > {TOTAL_TOL}x floor {floor_total:.2f}s"
        )
    for q, wall in cur["queries"].items():
        f = floor["queries"].get(q)
        if f is not None and wall > f * QUERY_TOL:
            failures.append(f"{q}: {wall:.2f}s > {QUERY_TOL}x floor {f:.2f}s")

    for q, wall in sorted(cur["queries"].items()):
        f = floor["queries"].get(q)
        rel = f" ({wall / f:.2f}x floor)" if f else " (no floor)"
        print(f"  {q}: {wall:.3f}s{rel}")
    if failures:
        print("BENCH REGRESSION:")
        for msg in failures:
            print("  " + msg)
        return 1
    print(f"bench ok: total {cur['value']:.2f}s vs floor {floor_total:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
