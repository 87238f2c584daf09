"""Dump .explain("formatted") for declared (and optionally demoted)
queries to plans/<tag>/<query>_<suffix>.txt — the before/after plan
evidence for optimization rounds.

Usage: python tools/dump_plans.py --out plans/r17 --suffix after
           [--sf DIR] [--repo DIR] [--queries a,b,c] [--demoted]

--repo lets the tool run against a worktree checkout (the "before"
side) while being invoked from anywhere.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--queries", default=None, help="comma list; default = all declared")
    ap.add_argument("--demoted", action="store_true", help="include demoted queries")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import __spark_entry__ as entry
    from dump_es_parquet_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="dump-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )

    qs = dict(entry.queries())
    if args.demoted:
        qs.update(getattr(entry, "demoted_queries", lambda: {})())
    if args.queries:
        want = [q.strip() for q in args.queries.split(",") if q.strip()]
        missing = [q for q in want if q not in qs]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        qs = {q: qs[q] for q in want}

    os.makedirs(args.out, exist_ok=True)
    jvm_explain = spark._jvm.PythonSQLUtils.explainString
    for name, fn in qs.items():
        try:
            df = fn(spark, args.sf)
            plan = jvm_explain(df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record the failure in place
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
