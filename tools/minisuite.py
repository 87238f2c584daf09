"""Mini-suite A/B harness: replay the bench's session-aging context
(warm up the first N declared queries in bench order) inside ONE
session, then time the target queries 3x each — the in-suite number a
full bench would show, at ~1/10 the wall cost. Usage:

    python tools/minisuite.py --repo DIR --prefix 25 --targets a,b,c
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

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="minisuite",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    qs = entry.queries()
    names = list(qs)
    targets = [t.strip() for t in args.targets.split(",") if t.strip()]
    for name in names[: args.prefix]:
        t0 = time.time()
        qs[name](spark, args.sf).count()
        print(f"# warmup {name}: {time.time()-t0:.2f}s", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
    out = {}
    for name in targets:
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            qs[name](spark, args.sf).count()
            runs.append(round(time.time() - t0, 2))
            gc.collect()
        out[name] = runs
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps({"repo": args.repo, "targets": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
