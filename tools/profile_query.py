"""Profile one (or more) declared/demoted queries: warm up, then run
timed with Spark event logging on, and print a per-job breakdown
(job group description, duration, stages, shuffle bytes) plus wall
times. Also writes .explain("formatted") when --plan DIR is given.

Usage: python tools/profile_query.py <query> [<query> ...]
           [--sf DIR] [--runs N] [--plan DIR]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None)
    args = ap.parse_args()

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    import __spark_entry__ as entry
    from dump_es_parquet_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    allq = {**entry.queries(), **entry.demoted_queries()}
    sc = spark.sparkContext

    for name in args.queries:
        fn = allq[name]
        # warm-up
        t0 = time.time()
        fn(spark, args.sf).count()
        warm = time.time() - t0
        spark.catalog.clearCache()
        gc.collect()
        times = []
        for i in range(args.runs):
            sc.setJobGroup(f"q:{name}:{i}", name)
            t0 = time.time()
            fn(spark, args.sf).count()
            times.append(time.time() - t0)
            sc.setJobGroup(None, None)
            spark.catalog.clearCache()
            gc.collect()
        print(f"== {name}: warm {warm:.2f}s runs {[round(t,2) for t in times]}")
        if args.plan:
            os.makedirs(args.plan, exist_ok=True)
            df = fn(spark, args.sf)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(args.plan, f"{name}.txt"), "w") as fh:
                fh.write(p)
    spark.stop()

    # parse the event log: job breakdown for the LAST timed run of each query
    evfiles = []
    for root, _dirs, files in os.walk(EVDIR):
        for f in files:
            if "appstatus" not in f:
                evfiles.append(os.path.join(root, f))
    jobs = {}  # jobId -> dict
    stages = {}  # stageId -> dict
    for ef in evfiles:
        with open(ef) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                t = ev.get("Event")
                if t == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "group": props.get("spark.jobGroup.id", ""),
                        "desc": props.get("spark.job.description", ""),
                        "start": ev.get("Submission Time", 0),
                        "stages": [
                            s["Stage ID"] for s in ev.get("Stage Infos", [])
                        ],
                        "callsite": props.get("callSite.short", ""),
                    }
                elif t == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j is not None:
                        j["end"] = ev.get("Completion Time", 0)
                elif t == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si.get("Stage Name", ""),
                        "tasks": si.get("Number of Tasks", 0),
                        "ms": si.get("Completion Time", 0)
                        - si.get("Submission Time", 0),
                    }
    byrun: dict[str, list] = {}
    for jid, j in sorted(jobs.items()):
        g = j.get("group", "")
        if g.startswith("q:"):
            byrun.setdefault(g, []).append((jid, j))
    for g in sorted(byrun):
        name, run = g[2:].rsplit(":", 1)
        if run != str(args.runs - 1):
            continue
        print(f"\n## job breakdown {name} (run {run})")
        tot = 0
        for jid, j in byrun[g]:
            dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
            tot += dur
            stg = [
                f"{sid}:{stages.get(sid, {}).get('tasks', '?')}t/"
                f"{stages.get(sid, {}).get('ms', 0)}ms"
                for sid in j["stages"]
                if sid in stages
            ]
            print(
                f"  job {jid}: {dur:6.3f}s  {j.get('callsite','')}  "
                f"stages[{len(j['stages'])}] ran={stg}"
            )
        print(f"  sum of job wall: {tot:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
