"""Time EVERY registered query once through the noop sink (guide §1).

Not a benchmark — a coverage instrument for the optimization round:
one warm-ish pass over all 292 qids at $SPARK_GRAFT_SF_DIR so slow
outliers outside the bench headline set surface. Streaming queries
really run Structured Streaming and dominate their own wall time by
design. Prints one JSON dict {qid: sec} sorted descending.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metoffice_spark.registry import all_queries
from metoffice_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("metoffice-time-all")
    reg = all_queries()
    qids = sys.argv[1:] or sorted(reg)
    reg[qids[0]](spark, sf_dir).limit(1).collect()  # JVM warm-up
    out: dict[str, float] = {}
    for qid in qids:
        t0 = time.perf_counter()
        try:
            reg[qid](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out[qid] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # pragma: no cover - report, keep going
            out[qid] = -1.0
            print(f"{qid} FAILED: {exc}", file=sys.stderr)
        print(f"{qid}: {out[qid]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            dict(sorted(out.items(), key=lambda kv: -kv[1])), indent=1
        )
    )


if __name__ == "__main__":
    main()
