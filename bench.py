"""Benchmark runner (driver contract): run every declared query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (count + a cheap checksum collect) so the
timing includes the whole plan, not just planning.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    except ValueError:
        sf = -1.0  # unrecognized dir naming — still emit the JSON line

    import __spark_entry__ as entry
    from dump_es_parquet_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "100g"},
    )

    # One untimed warm-up sweep over ALL queries first: the early
    # entries in queries() otherwise pay the JVM/codegen/broadcast
    # warm-up that later entries get for free, so any reordering of
    # queries() changes their "steady" numbers by 2-4x and breaks
    # round-over-round comparison (observed r02 -> r04).
    queries = entry.queries()
    # demoted queries are timed too (reported separately, excluded from
    # the headline total so it stays comparable round-over-round) —
    # e.g. in-query sim_ann_ivf vs the declared indexed serving path.
    extra = getattr(entry, "demoted_queries", lambda: {})()
    for name, fn in {**queries, **extra}.items():
        try:
            t0 = time.time()
            fn(spark, sf_dir).count()
            print(f"# warmup {name}: {time.time() - t0:.2f}s", file=sys.stderr)
        except Exception as e:
            print(f"# warmup {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        # drop the frame's py4j refs NOW so the ContextCleaner can
        # release its lazy-localCheckpoint blocks before the next query
        # measures — otherwise blocks from 4 runs x N queries pile up
        # and a late query pays the cleanup in ITS timed window
        # (observed: dedup_minhash_lsh 1.95s run 1, 6s runs 2-3 right
        # after the ngram warm-ups).
        gc.collect()

    # After the sweep, each query runs 3x warm; steady-state is the
    # best of the last two runs (min of all 3 could still catch one
    # noisy GC/scheduler moment on the first).
    timings: dict[str, float] = {}
    extra_timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    total = 0.0
    for name, fn in {**queries, **extra}.items():
        runs = []
        n = None
        out = timings if name in queries else extra_timings
        try:
            for _ in range(3):
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                runs.append(time.time() - t0)
                gc.collect()  # see warm-up loop comment
            steady = min(runs[1:])
            cold[name] = round(runs[0], 3)
            out[name] = round(steady, 3)
            if name in queries:
                total += steady
            print(
                f"# {name}: {n} rows, first {runs[0]:.2f}s steady {steady:.2f}s",
                file=sys.stderr,
            )
        except Exception as e:
            out[name] = cold[name] = -1.0
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)

    # the ONE stdout line (everything else goes to stderr), flushed
    # before spark.stop() so a slow JVM teardown can't truncate it.
    # The driver's tail capture is short, so the line must stay COMPACT:
    # steady timings only (2-decimal), separators without spaces; the
    # cold run and per-run detail go to stderr instead of stdout.
    print(
        json.dumps(
            {"runs": 3, "warmup": "full sweep", "steady": "min(last 2 runs)", "queries_first": cold}
        ),
        file=sys.stderr,
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(total, 2),
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in timings.items()},
                "extra": {k: round(v, 2) for k, v in extra_timings.items()},
                "sf": sf,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
