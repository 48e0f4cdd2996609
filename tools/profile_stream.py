"""Phase-level profiler for the streaming replay queries (guide §1).

Splits a q_stream_* qid's wall time into its real phases:

  1. setup    — tune() + substrate persist + replay input-file write
                (everything before readStream.start())
  2. stream   — StreamingQuery start → awaitTermination
  3. readback — spark.read.parquet(out) through the noop sink

and dumps the per-micro-batch ``recentProgress`` (triggerExecution,
addBatch, stateOperators' allUpdatesTimeMs / allRemovalsTimeMs /
commitTimeMs / numRowsTotal) so state-store cost is attributable —
the instrument VERDICT r13 item 1 asks for.  Phase boundaries come
from monkey-patching the module's ``_read_stream`` (phase 1→2 edge)
and ``_run_to_parquet``'s return (2→3 edge); query code is untouched.

Usage: PYTHONPATH=/root/repo python tools/profile_stream.py q_stream_join ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metoffice_spark.registry import all_queries
from metoffice_spark.session import get_spark
import metoffice_spark.operators.streaming_batch as sb


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("metoffice-profile-stream")
    reg = all_queries()
    qids = sys.argv[1:] or ["q_stream_join"]

    marks: dict[str, float] = {}
    progress: list[dict] = []

    orig_read_stream = sb._read_stream
    orig_run = sb._run_to_parquet

    def read_stream_hook(*a, **k):
        marks.setdefault("stream_start", time.perf_counter())
        return orig_read_stream(*a, **k)

    def run_hook(stream_df, root, mode="append"):
        # _read_stream may have been bypassed (inline runners); mark late
        marks.setdefault("stream_start", time.perf_counter())
        out = orig_run(stream_df, root, mode)
        marks["stream_end"] = time.perf_counter()
        return out

    sb._read_stream = read_stream_hook
    sb._run_to_parquet = run_hook

    # capture recentProgress via the plan-dump hook (no env needed)
    orig_dump = sb._dump_stream_plan

    def dump_hook(q):
        for p in q.recentProgress:
            progress.append(p)
        return orig_dump(q)

    sb._dump_stream_plan = dump_hook

    reg[qids[0]](spark, sf_dir).limit(1).collect()  # warm-up

    report = {}
    for qid in qids:
        marks.clear()
        progress.clear()
        t0 = time.perf_counter()
        df = reg[qid](spark, sf_dir)
        t_build = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_end = time.perf_counter()
        ss = marks.get("stream_start", t_build)
        se = marks.get("stream_end", t_build)
        batches = []
        for p in progress:
            d = p.get("durationMs", {})
            ops = [
                {
                    k: so.get(k)
                    for k in (
                        "operatorName", "numRowsTotal", "numRowsUpdated",
                        "allUpdatesTimeMs", "allRemovalsTimeMs",
                        "commitTimeMs", "stateMemory",
                    )
                }
                for so in p.get("stateOperators", [])
            ]
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": d,
                    "stateOperators": ops,
                }
            )
        report[qid] = {
            "wall": round(t_end - t0, 3),
            "setup": round(ss - t0, 3),
            "stream": round(se - ss, 3),
            "readback": round(t_end - se, 3),
            "batches": batches,
        }
        print(f"{qid}: {json.dumps(report[qid]['wall'])} "
              f"(setup {report[qid]['setup']}, stream {report[qid]['stream']},"
              f" readback {report[qid]['readback']})", file=sys.stderr)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
