"""Per-query profiling harness for the bench headliners (guide §1).

Runs each HEADLINE query once (same noop-sink methodology as
bench.py), labelled via setJobDescription, with the Spark event log
enabled, then parses the event log to attribute per-query:

  - wall seconds (driver-side, perf_counter)
  - number of jobs / stages / tasks
  - executor run time, shuffle bytes written, records shuffled
  - time NOT covered by any stage (driver/plan/scheduling gaps)

Usage:
  PYTHONPATH=/root/repo python tools/profile_bench.py [qid ...]

Writes a JSON report to stdout (one dict per query) so before/after
comparisons diff cleanly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metoffice_spark.registry import all_queries
from metoffice_spark.session import get_spark
from bench import HEADLINE


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/spark-events-profile"
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.appName("metoffice-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    reg = all_queries()
    qids = sys.argv[1:] or list(HEADLINE)

    # warm-up
    reg[qids[0]](spark, sf_dir).limit(1).collect()

    walls: dict[str, float] = {}
    spans: dict[str, tuple[float, float]] = {}
    for qid in qids:
        sc = spark.sparkContext
        sc.setJobDescription(qid)
        t0 = time.perf_counter()
        wall_t0 = time.time() * 1000.0
        reg[qid](spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls[qid] = time.perf_counter() - t0
        spans[qid] = (wall_t0, time.time() * 1000.0)
        sc.setJobDescription(None)
    spark.stop()

    # ---- parse the event log -------------------------------------------
    evfile = [os.path.join(evdir, f) for f in os.listdir(evdir)]
    evfile = max(evfile, key=os.path.getmtime)
    if os.path.isdir(evfile):
        # Spark 4 rolling layout: a directory of events_* part files
        parts = sorted(
            os.path.join(evfile, f)
            for f in os.listdir(evfile)
            if f.startswith("events_")
        )
    else:
        parts = [evfile]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    import itertools

    with __import__("contextlib").ExitStack() as stack:
        lines = itertools.chain.from_iterable(
            stack.enter_context(open(p)) for p in parts
        )
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {"desc": desc, "t0": ev.get("Submission Time")}
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jobs.setdefault(ev["Job ID"], {})["t1"] = ev.get(
                    "Completion Time"
                )
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                st.update(
                    tasks=si.get("Number of Tasks", 0),
                    t0=si.get("Submission Time", 0),
                    t1=si.get("Completion Time", 0),
                    name=si.get("Stage Name", ""),
                )
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                # Spark 4 event logs carry task metrics as internal
                # accumulator updates on Task Info
                acc = {
                    a.get("Name"): a.get("Update", 0)
                    for a in (ev.get("Task Info") or {}).get(
                        "Accumulables", []
                    )
                }
                st["run_ms"] = st.get("run_ms", 0) + acc.get(
                    "internal.metrics.executorRunTime", 0
                )
                st["shuffle_write"] = st.get("shuffle_write", 0) + acc.get(
                    "internal.metrics.shuffle.write.bytesWritten", 0
                )
                st["shuffle_read"] = (
                    st.get("shuffle_read", 0)
                    + acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                    + acc.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0
                    )
                )

    report = {}
    for qid in qids:
        lo, hi = spans[qid]
        q_jobs = [
            j
            for j in jobs.values()
            if j.get("t0") and lo <= j["t0"] <= hi
        ]
        q_sids = [
            sid
            for sid, jid in stage_to_job.items()
            if jobs.get(jid, {}).get("t0") and lo <= jobs[jid]["t0"] <= hi
        ]
        q_stages = [stages[s] for s in q_sids if s in stages]
        stage_wall = sum(
            (s.get("t1", 0) - s.get("t0", 0)) for s in q_stages
        )
        report[qid] = {
            "wall_s": round(walls[qid], 3),
            "jobs": len(q_jobs),
            "stages": len(q_stages),
            "tasks": sum(s.get("tasks", 0) for s in q_stages),
            "stage_wall_s": round(stage_wall / 1000.0, 3),
            "exec_run_s": round(
                sum(s.get("run_ms", 0) for s in q_stages) / 1000.0, 3
            ),
            "shuffle_write_mb": round(
                sum(s.get("shuffle_write", 0) for s in q_stages) / 1e6, 2
            ),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
