"""Mini-suite A/B harness: replay an APPROXIMATION of the bench's
session-aging context (warm up the first N declared queries in bench
order — NOT bench.py's full 223-query warm-up sweep, so absolute
numbers can differ from a full bench; A/B DELTAS between two repos
under the same --prefix are the comparable quantity) inside ONE
session, then time the target queries 3x each, at ~1/10 the wall cost
of a full bench. Usage:

    python tools/minisuite.py --repo DIR --prefix 25 --targets a,b,c

Defaults are this sandbox's bench context (sf0.1, 16g driver,
$SPARK_GRAFT_CPUS or 32 cores) — override per machine.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--prefix", type=int, default=25)
    ap.add_argument("--targets", required=True)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import __spark_entry__ as entry
    from dump_es_parquet_spark.session import get_spark

    declared = entry.queries()
    qs = {**declared, **getattr(entry, "demoted_queries", lambda: {})()}
    targets = [t.strip() for t in args.targets.split(",") if t.strip()]
    unknown = [t for t in targets if t not in qs]
    if unknown:
        print(f"unknown target query name(s): {unknown}", file=sys.stderr)
        return 2

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="minisuite",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    names = list(declared)  # warm-up replays DECLARED bench order
    failed: dict[str, str] = {}
    for name in names[: args.prefix]:
        # a failing warm-up query must not abort the session after
        # minutes of warm-up (bench.py's sweep has the same guard)
        try:
            t0 = time.time()
            qs[name](spark, args.sf).count()
            print(f"# warmup {name}: {time.time()-t0:.2f}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record and continue
            failed[name] = f"{type(e).__name__}: {e}"
            print(f"# warmup {name}: FAILED {failed[name]}", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
    out: dict[str, list[float]] = {}
    for name in targets:
        runs: list[float] = []
        for _ in range(args.runs):
            try:
                t0 = time.time()
                qs[name](spark, args.sf).count()
                runs.append(round(time.time() - t0, 2))
            except Exception as e:  # noqa: BLE001 — partial results still emit
                failed[name] = f"{type(e).__name__}: {e}"
                print(f"# {name}: FAILED {failed[name]}", file=sys.stderr)
                break
            gc.collect()
        out[name] = runs
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps({"repo": args.repo, "targets": out, "failed": failed}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
