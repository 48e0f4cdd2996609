"""Semantic property tests for the round-5g wave: JL random
projection, two-phase heavy hitters, funnel conversion latency."""

from __future__ import annotations

import hashlib
import math
import re


def test_random_projection_recount_and_jl(spark, sf_smoke):
    """A probe vector's projected coordinates match a Python recount
    of the sign matrix, and the mean norm ratio concentrates near 1
    (the JL expectation)."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.mlalgebra import _RP_K, q_random_projection

    rows = {r["vec_id"]: r for r in q_random_projection(spark, sf_smoke).collect()}
    assert rows

    def sign(j: int, pos: int) -> int:
        nib = hashlib.md5(f"RP{j}|{pos}".encode()).hexdigest()[0]
        return 1 if "0123456789abcdef".index(nib) % 2 == 0 else -1

    emb = load(spark, sf_smoke, "embeddings").orderBy("vec_id").limit(3).collect()
    for e in emb:
        v = [math.floor(x * 1_000_000 + 0.5) for x in e["embedding"]]
        r = rows[e["vec_id"]]
        for j in range(_RP_K):
            expected = sum(x * sign(j, i) for i, x in enumerate(v))
            assert r[f"p{j}"] == expected
        n2 = sum(x * x for x in v)
        p2 = sum(r[f"p{j}"] ** 2 for j in range(_RP_K))
        assert math.isclose(r["norm_ratio"], (p2 / _RP_K) / n2, rel_tol=1e-12)
    mean_ratio = sum(r["norm_ratio"] for r in rows.values()) / len(rows)
    assert 0.5 < mean_ratio < 2.0


def test_heavy_hitters_bounds_and_recall(spark, sf_smoke):
    """est_lb never exceeds the exact count; every token above the
    N/K threshold appears in the candidate output (Zipf heads cannot
    be missed by per-shard top-m)."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.sketches import _HH_K, q_heavy_hitters_mg

    rows = q_heavy_hitters_mg(spark, sf_smoke).collect()
    assert rows
    counts: dict = {}
    for r in load(spark, sf_smoke, "documents").select("text").collect():
        for t in re.split(r"[^a-z0-9]+", r["text"].lower()):
            if t:
                counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    got = {r["tok"] for r in rows}
    for r in rows:
        assert r["est_lb"] <= r["exact_cnt"]
        assert r["exact_cnt"] == counts[r["tok"]]
        assert r["n_total"] == total
        assert r["is_hh"] == (r["exact_cnt"] * _HH_K > total)
    true_hh = {t for t, c in counts.items() if c * _HH_K > total}
    assert true_hh <= got


def test_funnel_latency_rank_stats(spark, sf_smoke):
    """The distribution row matches a Python recount of per-user
    first-click→first-subsequent-purchase latencies."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.behavior import q_funnel_latency

    row = q_funnel_latency(spark, sf_smoke).collect()[0]
    ev = load(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    import calendar

    def utc_s(ts) -> int:
        return calendar.timegm(ts.timetuple())

    clicks: dict = {}
    for r in ev:
        if r["event_type"] == "click":
            s = utc_s(r["ts"])
            clicks[r["user_id"]] = min(clicks.get(r["user_id"], s), s)
    lats = {}
    for r in ev:
        if r["event_type"] == "purchase" and r["user_id"] in clicks:
            s = utc_s(r["ts"])
            if s >= clicks[r["user_id"]]:
                d = s - clicks[r["user_id"]]
                lats[r["user_id"]] = min(lats.get(r["user_id"], d), d)
    xs = sorted(lats.values())
    n = len(xs)
    assert row["n"] == n
    assert row["min_s"] == xs[0]
    assert row["max_s"] == xs[-1]
    assert row["p50_s"] == xs[(n + 1) // 2 - 1]
    assert row["p90_s"] == xs[(9 * n + 9) // 10 - 1]
