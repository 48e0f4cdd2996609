"""Semantic tests for the co-grouped applyInPandas as-of merge."""

from __future__ import annotations

import calendar


def test_cogrouped_asof_matches_python_recount(spark, sf_smoke):
    """Every purchase appears exactly once; the picked click is the
    latest at-or-before it with (ep, event_id) tie-break; users with
    no prior click get NULLs."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.udf import q_udf_cogrouped

    rows = q_udf_cogrouped(spark, sf_smoke).collect()
    ev = load(spark, sf_smoke, "events").collect()

    def ep(ts):
        return calendar.timegm(ts.timetuple())

    purchases = [
        (r["user_id"], r["event_id"], ep(r["ts"]))
        for r in ev
        if r["event_type"] == "purchase"
    ]
    clicks: dict = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks.setdefault(r["user_id"], []).append(
                (ep(r["ts"]), r["event_id"], int(r["value"] * 100 + 0.5))
            )
    assert len(rows) == len(purchases)
    got = {(r["user_id"], r["purchase_event_id"]): r for r in rows}
    assert len(got) == len(purchases)
    for u, eid, pep in purchases:
        r = got[(u, eid)]
        assert r["purchase_s"] == pep
        cands = [c for c in clicks.get(u, []) if c[0] <= pep]
        if not cands:
            assert r["last_click_s"] is None
            assert r["gap_s"] is None
            assert r["click_cents"] is None
        else:
            best = max(cands)
            assert r["last_click_s"] == best[0]
            assert r["gap_s"] == pep - best[0]
            assert r["click_cents"] == best[2]
