"""Repo-wide scale tripwire: no registered query may plan an
UNBOUNDED single-partition window (``WindowExec`` with an empty
partitionSpec over data-sized input). Bounded global windows are
sanctioned — the per-partition offsets tables of
functions/distributed.py, post-``limit`` top-k results, sketch/decile
tables — and all sit above an Aggregate (or a bounded limit), which
is the heuristic used here: an empty-partition window is flagged only
when NO Aggregate/Limit node exists below it in the physical plan.

The round-6 sweep migrated 15 such windows (warehouse quintiles,
Lorenz deciles, ABC cumshare, skyline prefix-min, funnel/eval/skew
ranks, vocab and top-k rankings, gaps-and-islands, batch packing) to
the distributed primitives; this test keeps the count at zero.
"""

from __future__ import annotations

from metoffice_spark.registry import all_queries


def _bounded_below(node) -> bool:
    for j in range(node.children().length()):
        ch = node.children().apply(j)
        name = ch.nodeName()
        if "Aggregate" in name or "Limit" in name or _bounded_below(ch):
            return True
    return False


def _unbounded_global_windows(df) -> list:
    bad = []

    def walk(node):
        if "Window" in node.nodeName():
            try:
                if node.partitionSpec().isEmpty() and not _bounded_below(node):
                    bad.append(node.nodeName())
            except Exception:
                pass
        for j in range(node.children().length()):
            walk(node.children().apply(j))

    walk(df._jdf.queryExecution().sparkPlan())
    return bad


def test_no_registered_query_plans_an_unbounded_global_window(spark, sf_smoke):
    offenders = {}
    for qid, fn in all_queries().items():
        if qid.startswith("q_stream_"):
            # building a streaming query RUNS the replay (minutes in
            # aggregate); their returned sink-read plans are parquet
            # scans that cannot contain window nodes
            continue
        try:
            bad = _unbounded_global_windows(fn(spark, sf_smoke))
        except Exception:
            # plan-construction failures belong to the parity gate,
            # not this tripwire
            continue
        if bad:
            offenders[qid] = bad
    assert offenders == {}
