"""Repo-wide scale tripwire: no registered query may plan an
UNBOUNDED single-partition window (``WindowExec`` with an empty
partitionSpec over data-sized input). The boundedness rule lives in
``plan_walkers.unbounded_global_windows`` (shared with
test_distributed_windows): only a Limit or a ``__gpid``-keyed offsets
aggregate below the window sanctions it — an aggregate on arbitrary
keys does NOT, because the pre-migration scale-killers (global ranks
over per-customer / per-key aggregate tables) all had exactly that
shape (r06 review hardening).

Two queries legitimately window over bounded non-pid aggregates and
are allowlisted with their exact window counts; growing either count,
or any new flagged query, fails the test. Builder errors fail too —
a query this test cannot plan is not covered (r06 review)."""

from __future__ import annotations

from plan_walkers import unbounded_global_windows

from metoffice_spark.registry import all_queries

# qid -> exact expected count of flagged-but-justified global windows
_ALLOWLIST = {
    # cumulative offsets over the systematic-sampling bucket table:
    # bucket count is the fixed sampling constant, not data-sized
    "q_sample_weighted": 1,
    # cumulative hazard over the per-day risk table: bounded by the
    # calendar span of the dataset, which grows with time, not volume
    "q_survival_hazard": 1,
}


def test_no_registered_query_plans_an_unbounded_global_window(spark, sf_smoke):
    offenders = {}
    errors = {}
    for qid, fn in all_queries().items():
        if qid.startswith("q_stream_"):
            # building a streaming query RUNS the replay (minutes in
            # aggregate); their returned sink-read plans are parquet
            # scans that cannot contain window nodes
            continue
        try:
            bad = unbounded_global_windows(fn(spark, sf_smoke))
        except Exception as e:  # noqa: BLE001 - report, don't skip
            errors[qid] = f"{type(e).__name__}: {e}"
            continue
        if len(bad) != _ALLOWLIST.get(qid, 0):
            offenders[qid] = bad
    assert errors == {}, f"builders failed to plan: {errors}"
    assert offenders == {}
