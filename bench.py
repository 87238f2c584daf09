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

#: A steady time this many × the query's own warm-up time is treated as
#: sandbox-load contamination, not a plan property (r05 adjudicated five
#: such phantom regressions — adjacent queries spiking 1.7-5.5× with
#: unchanged plans), and earns ONE retry; the floor keeps sub-150 ms
#: queries (where scheduler jitter alone spans 2×) out of the retry set.
RETRY_FACTOR = 2.0
RETRY_FLOOR_S = 0.15

#: Cross-query contamination control (VERDICT r17 Next #1): this box
#: has documented multi-minute host degradation phases (80-97% kernel
#: sys CPU, steal to 17%) that inflate memory-heavy queries 5-20x while
#: the retry heuristic is blind to a phase spanning a query's warm-up
#: AND timed runs. Two independent detectors mark (never alter) the
#: timings: the control query re-timed every CONTROL_EVERY queries,
#: and the /proc/stat sys/steal share of each query's own timed window.
CONTROL_QUERY = "q1_pricing_summary"
CONTROL_EVERY = 5
CONTROL_FACTOR = 2.0
CONTROL_MARGIN_S = 0.3
SYS_PCT_SUSPECT = 0.35
STEAL_PCT_SUSPECT = 0.05


def read_cpu_stat():
    """(busy+idle total, sys-like, steal) jiffies from /proc/stat's
    aggregate cpu line; None when unavailable (non-Linux)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(x) for x in parts[1:9]]
        # user nice system idle iowait irq softirq steal
        return sum(vals), vals[2] + vals[5] + vals[6], vals[7]
    except Exception:
        return None


def cpu_window(before, after):
    """sys/steal share of ALL cpu time between two read_cpu_stat()
    snapshots — the documented degradation-phase signature is 80-97%
    sys with steal spikes to 17%; healthy Spark load on this box stays
    well under SYS_PCT_SUSPECT."""
    if before is None or after is None:
        return None
    dt = after[0] - before[0]
    if dt <= 0:
        return None
    return {
        "sys_pct": round((after[1] - before[1]) / dt, 3),
        "steal_pct": round((after[2] - before[2]) / dt, 3),
    }


def control_flags(samples, names):
    """Queries whose timed window a control spike brackets.

    ``samples``: ordered [(n_queries_done_when_sampled, seconds)];
    ``names``: query names in run order. A sample above
    max(CONTROL_FACTOR x floor, floor + CONTROL_MARGIN_S) — floor =
    the run's own minimum control time — flags every query between the
    neighboring control samples (the spike may have started after the
    previous sample and persisted past this one)."""
    if len(samples) < 2:
        return set()
    floor = min(s for _, s in samples)
    thr = max(CONTROL_FACTOR * floor, floor + CONTROL_MARGIN_S)
    flagged: set = set()
    for j, (k, s) in enumerate(samples):
        if s <= thr:
            continue
        lo = samples[j - 1][0] if j > 0 else 0
        hi = samples[j + 1][0] if j + 1 < len(samples) else len(names)
        flagged.update(names[lo:hi])
    return flagged


def cpu_flags(windows):
    """Queries whose own timed window shows the kernel-time signature."""
    return {
        name
        for name, w in windows.items()
        if w
        and (
            w["sys_pct"] >= SYS_PCT_SUSPECT
            or w["steal_pct"] >= STEAL_PCT_SUSPECT
        )
    }


def needs_retry(steady: float, warmup: float) -> bool:
    """True when a steady-state time smells like a transient load spike:
    slower than RETRY_FACTOR × the same query's untimed warm-up run
    (same JVM, same caches — the warm-up is a valid lower-bound witness)
    and above the jitter floor."""
    return warmup > 0 and steady > RETRY_FACTOR * warmup and steady > RETRY_FLOOR_S


def steady_with_retry(run_once, runs: list[float], warmup: float):
    """Steady-state = min of the last 2 of 3 runs; if that still looks
    contaminated vs the warm-up (needs_retry), run ONE more and keep
    the min. Returns (steady_seconds, retried_bool)."""
    steady = min(runs[1:])
    if needs_retry(steady, warmup):
        return min(steady, run_once()), True
    return steady, False


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    except ValueError:
        sf = -1.0  # unrecognized dir naming — still emit the JSON line

    import __spark_entry__ as entry
    from dump_es_parquet_spark.session import get_spark

    # Heap sized to the workload, NOT the box: a 100g heap measured
    # 4-10x slower with 3x run-to-run variance on hosts whose
    # transparent_hugepage is `madvise` (heap expansion + G1 young
    # sweeps page-fault tens of GB in 4 KiB pages; with THP `always`
    # the same heap was free). sf0.1 peaks well under 16g — verified:
    # dedup_minhash_lsh steady 28.6s @100g vs 1.6s @16g on the same
    # host, identical plans.
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
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
    warmups: dict[str, float] = {}
    for name, fn in {**queries, **extra}.items():
        try:
            t0 = time.time()
            fn(spark, sf_dir).count()
            warmups[name] = time.time() - t0
            print(f"# warmup {name}: {warmups[name]:.2f}s", file=sys.stderr)
        except Exception as e:
            print(f"# warmup {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        # drop the frame's py4j refs NOW so the ContextCleaner can
        # release its lazy-localCheckpoint blocks before the next query
        # measures — otherwise blocks from 4 runs x N queries pile up
        # and a late query pays the cleanup in ITS timed window
        # (observed: dedup_minhash_lsh 1.95s run 1, 6s runs 2-3 right
        # after the ngram warm-ups).
        # clearCache additionally drops SQL-cache entries (.cache()
        # inside query forms registers by canonicalized plan and
        # OUTLIVES the frame) — without it a 112-query session
        # accumulates storage-memory pressure that shows up as driver-
        # run outliers (dedup_minhash_lsh 3.41s driver vs 1.02s local,
        # VERDICT r08 Next #5).
        spark.catalog.clearCache()
        gc.collect()

    # After the sweep, each query runs 3x warm; steady-state is the
    # best of the last two runs (min of all 3 could still catch one
    # noisy GC/scheduler moment on the first).
    timings: dict[str, float] = {}
    extra_timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    retried: list[str] = []
    cpu_windows: dict[str, dict | None] = {}
    control_samples: list[tuple[int, float]] = []
    run_order: list[str] = []
    total = 0.0

    def run_control(n_done: int) -> None:
        # the control run replicates a query's steady conditions
        # (cache just cleared by the previous finally) and is NOT the
        # control query's own timed slot — q1 still times normally
        ctl = queries.get(CONTROL_QUERY)
        if ctl is None:
            return
        try:
            t0 = time.time()
            ctl(spark, sf_dir).count()
            control_samples.append((n_done, round(time.time() - t0, 3)))
        except Exception:
            pass
        finally:
            spark.catalog.clearCache()
            gc.collect()

    run_control(0)
    for name, fn in {**queries, **extra}.items():
        runs = []
        n = None
        out = timings if name in queries else extra_timings
        cpu0 = read_cpu_stat()
        try:

            rows = [None]

            def run_once():
                t0 = time.time()
                rows[0] = fn(spark, sf_dir).count()
                el = time.time() - t0
                gc.collect()  # see warm-up loop comment
                return el

            for _ in range(3):
                runs.append(run_once())
            n = rows[0]
            steady, did_retry = steady_with_retry(
                run_once, runs, warmups.get(name, 0.0)
            )
            if did_retry:
                retried.append(name)
            cold[name] = round(runs[0], 3)
            out[name] = round(steady, 3)
            if name in queries:
                total += steady
            print(
                f"# {name}: {n} rows, first {runs[0]:.2f}s steady {steady:.2f}s"
                + (" (retried: load spike suspected)" if did_retry else ""),
                file=sys.stderr,
            )
        except Exception as e:
            out[name] = cold[name] = -1.0
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
        finally:
            cpu_windows[name] = cpu_window(cpu0, read_cpu_stat())
            run_order.append(name)
            # between QUERIES only (never between a query's own runs,
            # which legitimately share plan-keyed cache entries): a
            # long session must not carry one query's cached blocks
            # into the next query's timed window — see warm-up loop
            spark.catalog.clearCache()
            gc.collect()
            if len(run_order) % CONTROL_EVERY == 0:
                run_control(len(run_order))
    run_control(len(run_order))

    # Durable per-query artifact (VERDICT r17 Next #1): the driver's
    # tail capture keeps only ~2 KB of stdout, so round-over-round
    # per-query comparison was blind (PERF_r17 per_query = {}). Write
    # the COMPLETE per-query map + contamination markers to a file the
    # judge can read, leaving the stdout contract untouched. Suspect
    # entries are MARKED, never altered — the timings stay raw.
    suspects: dict[str, list[str]] = {}
    for q in control_flags(control_samples, run_order):
        suspects.setdefault(q, []).append("control_spike")
    for q in cpu_flags(cpu_windows):
        suspects.setdefault(q, []).append("cpu_sys_steal")
    perquery_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_PERQUERY.json"
    )
    try:
        tmp = perquery_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "metric": "total_query_seconds",
                    "value": round(total, 2),
                    "unit": "sec",
                    "sf": sf,
                    "cpus": int(cpus),
                    "queries": timings,
                    "extra": extra_timings,
                    "cold": cold,
                    "retried": retried,
                    "control": {
                        "query": CONTROL_QUERY,
                        "every": CONTROL_EVERY,
                        "samples": control_samples,
                        "floor": min(
                            (s for _, s in control_samples), default=None
                        ),
                    },
                    "cpu_windows": cpu_windows,
                    "suspect": {
                        k: suspects[k] for k in sorted(suspects)
                    },
                },
                fh,
                indent=1,
            )
        os.replace(tmp, perquery_path)
        print(f"# wrote {perquery_path}", file=sys.stderr)
    except OSError as e:
        print(f"# BENCH_PERQUERY write failed: {e}", file=sys.stderr)

    # the ONE stdout line (everything else goes to stderr), flushed
    # before spark.stop() so a slow JVM teardown can't truncate it.
    # The driver's tail capture is short, so the line must stay COMPACT:
    # steady timings only (2-decimal), separators without spaces; the
    # cold run and per-run detail go to stderr instead of stdout.
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    print(
        json.dumps(
            {
                "runs": 3,
                "warmup": "full sweep",
                "steady": "min(last 2 runs), 1 retry if >2x own warmup",
                "retried": retried,
                "loadavg_1_5_15": load,
                "queries_first": cold,
            }
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
    # The driver captures only the TAIL of stdout (~2 KB), and with 90+
    # per-query entries the detail line above outgrew it — its head,
    # including "value", was cut off and BENCH_r06 recorded parsed:null.
    # So the LAST stdout line is a short fixed-size summary with no
    # per-query map: the tail capture always keeps the end of the
    # stream, so this line survives regardless of how many queries we
    # add. summary_line() is a pure function so a unit test can pin its
    # size (< 300 bytes) against future field creep.
    print(summary_line(total, len(timings), len(extra_timings), sf), flush=True)
    spark.stop()
    return 0


def summary_line(total: float, n_queries: int, n_extra: int, sf: float) -> str:
    """The final, driver-parsed stdout line. MUST stay short (< 300
    bytes, pinned by tests/test_bench.py::
    test_summary_line_is_last_and_short) and contain no
    per-query map — the driver's tail capture keeps only the end of
    stdout, and this line must survive whole."""
    return json.dumps(
        {
            "metric": "total_query_seconds",
            "value": round(total, 2),
            "unit": "sec",
            "n_queries": n_queries,
            "n_extra": n_extra,
            "sf": sf,
        },
        separators=(",", ":"),
    )


if __name__ == "__main__":
    raise SystemExit(main())
