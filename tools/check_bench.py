"""Round-over-round bench regression gate.

The reference publishes no benchmark numbers (BASELINE.md), so the
perf contract is pinned against our own best-known walls instead:
BENCH_FLOOR.json records the fastest observed per-query time at sf0.1;
this tool runs (or reads) a bench result and fails if the total or any
query regresses beyond tolerance.

Usage:
    python tools/check_bench.py                # runs headline AND tpch fresh
    python tools/check_bench.py --headline     # headline suite only
    python tools/check_bench.py --tpch         # 22-query tpch suite only
    python tools/check_bench.py BENCH_r02.json # checks an existing run

With an artifact, the floor section is derived solely from the
artifact's "metric" field; a --tpch/--headline flag that contradicts
the artifact is an error (never a silent wrong-floor comparison).

Tolerances default to 1.8x on the headline total and 3.5x per query —
wide because walls on this shared box drift in multi-minute phases:
the same query measured 0.6x-3x of its best-known wall across three
back-to-back full runs with identical code (2026-08-13). A genuine
algorithmic regression (round 1's interpreted-HOF signature was 4.5x)
still trips them; the per-round BENCH_r{N} series is the
higher-signal trend.

r10 (VERDICT r9 #2): the canary protocol is part of the gate. r12
(VERDICT r11 #1) widened it from one canary to a BASKET: the machine
phase is the MEDIAN wall/floor ratio over {q01_pricing_summary,
q02_filter_scan, q_agg_stats}; every other query's floor ratio is
divided by it and flagged above BENCH_CANARY_TOL (1.5x) with a
BENCH_CANARY_ABS (0.25s) absolute-excess guard. This catches a true
single-query regression inside a fast phase (the 3.5x absolute
tolerance alone would pass a 1.9x regression) while a uniform slow
phase normalizes to ~1.0 — and, unlike the single q01 canary, one
basket member's bad luck (or a stale floor) cannot masquerade as a
slow phase. When the basket's ratios read persistently >1.5x across
sessions with no code change, the machine epoch moved: re-baseline
with tools/canary_probe.py (min across >= 3 fresh sessions).
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
# canary-normalized per-query tolerance (VERDICT r9 #2): a query's
# floor ratio divided by the canary's floor ratio. Catches a genuine
# single-query regression inside a FAST phase (which the wide 3.5x
# absolute tolerance would wave through) while a uniform slow phase
# normalizes to ~1.0 and passes.
CANARY_TOL = float(os.environ.get("BENCH_CANARY_TOL", "1.5"))
# absolute-seconds guard: sub-second queries jitter independently of
# the phase; a canary flag needs a real excess, not 0.1s of noise
CANARY_ABS_FLOOR = float(os.environ.get("BENCH_CANARY_ABS", "0.25"))
# phase basket (r12): median of three stable scan/agg queries' floor
# ratios — robust to one member's jitter or staleness
CANARY_BASKET = ["q01_pricing_summary", "q02_filter_scan", "q_agg_stats"]


def _run_bench(tpch: bool) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if tpch:
        cmd.append("--tpch")
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def check_one(cur: dict, floor: dict) -> int:
    """Compare one bench artifact against ITS floor section, derived
    from the artifact's metric — never from a flag (a headline
    artifact checked against the tpch floor would silently mis-grade:
    q01/q03/q05 exist in both sections with different walls)."""
    if cur.get("metric") == "tpch22_total_wall":
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

    # canary-normalized check (headline only; tpch has no canary):
    # phase = MEDIAN basket wall/floor ratio, clamped >= 1 (a lucky
    # fast basket must not inflate everyone else's normalized ratio)
    ratios = sorted(
        cur["queries"][q] / floor["queries"][q]
        for q in CANARY_BASKET
        if q in cur["queries"] and floor["queries"].get(q)
    )
    phase = None
    if ratios:
        if len(ratios) < len(CANARY_BASKET):
            # a partial basket degrades the phase estimate toward the
            # single-canary hazard the basket exists to fix — loud, so
            # a missing member or floor gets repaired, never relied on
            print(
                f"  WARNING: only {len(ratios)} of {len(CANARY_BASKET)} "
                "canary-basket members have runs + floors; phase estimate "
                "is degraded"
            )
        # true median (ADVICE r12): for even-length lists the mean of
        # the two middle values — the upper-middle element would let a
        # 2-member basket pick the LARGER ratio, inflating phase and
        # loosening the gate exactly when a member is missing
        mid = len(ratios) // 2
        med = ratios[mid] if len(ratios) % 2 else (ratios[mid - 1] + ratios[mid]) / 2.0
        phase = max(1.0, med)
        for q, wall in cur["queries"].items():
            f = floor["queries"].get(q)
            if q in CANARY_BASKET or f is None:
                continue  # basket members are covered by the 3.5x check
            rr = (wall / f) / phase
            if rr > CANARY_TOL and wall > f * phase + CANARY_ABS_FLOOR:
                failures.append(
                    f"{q}: {wall:.2f}s = {rr:.2f}x canary-normalized floor "
                    f"(phase {phase:.2f}x, median of {len(ratios)}-canary basket) "
                    f"> {CANARY_TOL}x"
                )

    for q, wall in sorted(cur["queries"].items()):
        f = floor["queries"].get(q)
        rel = f" ({wall / f:.2f}x floor)" if f else " (no floor)"
        print(f"  {q}: {wall:.3f}s{rel}")
    if phase is not None:
        detail = ", ".join(f"{r:.2f}x" for r in ratios)
        print(f"  [canary basket phase {phase:.2f}x (ratios: {detail})]")
    if failures:
        print("BENCH REGRESSION:")
        for msg in failures:
            print("  " + msg)
        return 1
    print(f"bench ok: total {cur['value']:.2f}s vs floor {floor_total:.2f}s")
    return 0


def main() -> int:
    with open(os.path.join(REPO, "BENCH_FLOOR.json")) as fh:
        floor = json.load(fh)

    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        with open(args[0]) as fh:
            cur = json.load(fh)
        if "queries" not in cur and isinstance(cur.get("parsed"), dict):
            cur = cur["parsed"]  # driver BENCH_r{N}.json wraps bench's line
        is_tpch = cur.get("metric") == "tpch22_total_wall"
        if ("--tpch" in flags and not is_tpch) or ("--headline" in flags and is_tpch):
            print(
                f"ERROR: {args[0]} metric={cur.get('metric')!r} contradicts "
                f"{' '.join(flags)}; mode is derived from the artifact"
            )
            return 2
        return check_one(cur, floor)

    rc = 0
    if "--tpch" not in flags:
        print("== headline suite ==")
        rc |= check_one(_run_bench(tpch=False), floor)
    if "--headline" not in flags:
        print("== tpch22 suite ==")
        rc |= check_one(_run_bench(tpch=True), floor)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
