"""Local mimic of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND its
oracle_sql() on DuckDB (tables pre-registered as views), compares
row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [--window] [name_substring ...]

--window runs exactly the driver's record set (the first 50 gates in
registration order, one session) as a pre-round preflight; it does
NOT rewrite CORRECTNESS_LOCAL.json.

A full (unfiltered) run also writes CORRECTNESS_LOCAL.json at the repo
root — per-query pass/fail in the driver's record shape — so full
83-query coverage is durable evidence even though the round driver
records only its first-50 window.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import os

SF_DIR = os.environ.get("CHECK_ORACLE_SF_DIR", "/root/testdata/sf0.01")

from shc_spark.session import TABLES  # noqa: E402 — single source of truth


def canon(val):
    """Canonicalize a cell for order-insensitive comparison."""
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 6)
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    if hasattr(val, "isoformat"):
        return val.isoformat()
    return val


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _print_freshness(queries: dict) -> None:
    """Per-gate freshest-driver-round table (VERDICT r11 #8): computed
    from the CORRECTNESS_r*.json artifacts so window rotation is
    self-auditing — the stale tail is visible BEFORE the round runs,
    and a gate about to fall off the freshness budget is flagged."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fresh: dict = {}
    latest_round = 0
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        latest_round = max(latest_round, r)
        try:
            rec = json.load(open(f))
        except Exception:
            continue
        for name, row in rec.items():
            good = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            if good:
                fresh[name] = max(fresh.get(name, 0), r)
    if not fresh:
        return
    window = set(list(queries)[:50])
    by_round: dict = {}
    for name in queries:
        by_round.setdefault(fresh.get(name, 0), []).append(name)
    print("-- driver-evidence freshness (gate count per freshest round) --")
    for r in sorted(by_round):
        names = by_round[r]
        in_w = sum(1 for n in names if n in window)
        tag = "NEVER-DRIVEN" if r == 0 else f"r{r}"
        stale = "  <-- STALE" if 0 < r <= latest_round - 4 else ""
        print(f"  {tag:>13}: {len(names):3d} gates ({in_w} in current window){stale}")
        if r == 0 or 0 < r <= latest_round - 4:
            uncovered = [n for n in names if n not in window]
            if uncovered:
                print(f"                 not in window: {', '.join(sorted(uncovered))}")
    print("----------------------------------------------------------------")


def main():
    filters = sys.argv[1:]
    window_only = "--window" in filters
    filters = [f for f in filters if f != "--window"]
    import __spark_entry__ as entry_mod
    from shc_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if window_only:
        # exactly what the round driver records: the first 50 gates,
        # in registration order, one session — the pre-round preflight
        _print_freshness(queries)
        queries = dict(list(queries.items())[:50])
    failed, passed, rows_only = [], [], []
    record: dict = {}
    for name, fn in queries.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {e}"))
            record[name] = {"rows_match": False, "err": f"spark: {e}"}
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            record[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(srows),
                "oracle_rows": None,
                "err": "no_oracle",
            }
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {e}"))
            record[name] = {"rows_match": False, "err": f"duckdb: {e}"}
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sk, dk = rows_key(srows, scols), rows_key(drows, dcols)
            if sk != dk:
                diff = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
                problems.append(f"values differ, e.g. {diff}")
        ok = not problems
        record[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": sorted(scols) == sorted(dcols),
            "hash_match": ok,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": None if ok else "; ".join(problems),
        }
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    if not window_only and "sf0.01" in SF_DIR:
        import json

        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CORRECTNESS_LOCAL.json")
        if not filters:
            # full run: rewrite wholesale (prunes unregistered gates)
            with open(out, "w") as fh:
                json.dump(record, fh, indent=1)
            print(f"wrote {out}")
        elif record:
            # filtered run: MERGE the re-run rows into the artifact —
            # each row is still evidence of a real run; newly added
            # gates get their first row without waiting for the next
            # full sweep (which remains the last commit of a round)
            prior = json.load(open(out)) if os.path.exists(out) else {}
            prior.update(record)
            with open(out, "w") as fh:
                json.dump(prior, fh, indent=1)
            print(f"merged {len(record)} rows into {out}")
    print(
        f"\n{len(passed)} ok, {len(failed)} failed, {len(rows_only)} rows-only "
        f"of {len(queries)} queries"
    )
    if filters and not (passed or failed or rows_only):
        print(f"ERROR: filters {filters} matched no query")
        sys.exit(2)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
