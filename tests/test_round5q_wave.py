"""Semantic property tests for the round-5q pair: graph modularity
and the entity-resolution blocking audit."""

from __future__ import annotations

import math


def test_modularity_terms_are_consistent(spark, sf_smoke):
    """Degree masses sum to M, within-edges never exceed degree mass,
    Q = sum of terms lies in [-1, 1], and the bipartite graph has
    ZERO within-community edges only if no nation holds both a
    customer and a supplier connected to each other."""
    from metoffice_spark.operators.mining import q_graph_modularity

    rows = q_graph_modularity(spark, sf_smoke).collect()
    assert rows
    q_total = sum(r["q_term"] for r in rows)
    assert -1.0 <= q_total <= 1.0
    for r in rows:
        assert 0 <= r["ein_c"] <= r["d_c"]
        assert r["n_nodes"] >= 1
        # recompute the term from the emitted exact counts
    # degree masses over all communities account for every directed edge
    # (every edge endpoint has a community: all custkeys/suppkeys map)
    m_implied = sum(r["d_c"] for r in rows)
    for r in rows:
        expect = r["ein_c"] / m_implied - (r["d_c"] / m_implied) ** 2
        assert math.isclose(r["q_term"], expect, rel_tol=1e-12)


def test_er_blocking_audit_bounds(spark, sf_smoke):
    """Blocked matches never exceed total matches; candidates are far
    fewer than the full cross product; recall recomputes."""
    from metoffice_spark.operators.linkage import q_er_blocking

    r = q_er_blocking(spark, sf_smoke).collect()[0]
    assert r["n_blocks"] >= 1 and r["n_names"] >= r["n_blocks"]
    full_pairs = r["n_names"] * (r["n_names"] - 1) // 2
    assert r["n_candidates"] < full_pairs
    assert 0 <= r["n_blocked"] <= r["n_total"]
    if r["n_total"] > 0:
        assert r["recall_fp"] == (r["n_blocked"] * 1_000_000) // r["n_total"]


def test_assortativity_in_range_and_disassortative(spark, sf_smoke):
    """|r| <= 1; the bipartite commerce graph (few high-degree
    suppliers vs many low-degree customers) must be strongly
    DISassortative; edge/node counts match the pagerank substrate."""
    from metoffice_spark.operators.mining import q_graph_assortativity

    r = q_graph_assortativity(spark, sf_smoke).collect()[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["assortativity"] < 0
    assert r["n_edges"] % 2 == 0  # both directions present
    assert r["n_nodes"] >= 2


def test_gap_islands_covers_key_space(spark, sf_smoke):
    """Island spans partition the observed keys exactly; sizes sum to
    the distinct key count; gaps are positive between islands and
    NULL after the last."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.quality import q_gap_islands

    rows = sorted(
        q_gap_islands(spark, sf_smoke).collect(), key=lambda r: r["island_start"]
    )
    n_keys = load(spark, sf_smoke, "orders").select("o_orderkey").distinct().count()
    assert sum(r["n_keys"] for r in rows) == n_keys
    for r in rows[:-1]:
        assert r["gap_to_next"] >= 1
        assert r["island_end"] - r["island_start"] + 1 == r["n_keys"]
    assert rows[-1]["gap_to_next"] is None


def test_stream_gap_detector_matches_batch_lag(spark, sf_smoke):
    """Streaming missed-tick alerts equal the batch lag recount —
    across the two-batch split — and every alert exceeds 1.5
    cadences with a consistent missed count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metoffice_spark.obs import observations
    from metoffice_spark.operators.streaming_batch import (
        _GAP_TOL,
        _TICK_S,
        q_stream_gap_detector,
    )

    streamed = {
        (r["station_id"], r["obs_id"]): (r["gap_s"], r["n_missed"])
        for r in q_stream_gap_detector(spark, sf_smoke).collect()
    }
    assert streamed
    w = Window.partitionBy("station_id").orderBy("ts", "obs_id")
    batch = (
        observations(spark, sf_smoke)
        .select(
            "station_id",
            "obs_id",
            (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias(
                "gap_s"
            ),
        )
        .filter(F.col("gap_s") > _GAP_TOL)
        .collect()
    )
    assert len(batch) == len(streamed)
    for r in batch:
        gap, missed = streamed[(r["station_id"], r["obs_id"])]
        assert gap == r["gap_s"] and gap > _GAP_TOL
        assert missed == (gap - 1) // _TICK_S >= 1


def test_skyline_is_exact_pareto_frontier(spark, sf_smoke):
    """Brute-force dominance recount: the returned set is exactly the
    non-dominated set, and every returned point is mutually
    non-dominating."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.warehouse import q_skyline_pareto

    sky = {
        (r["p_partkey"], r["price_cents"], r["p_size"])
        for r in q_skyline_pareto(spark, sf_smoke).collect()
    }
    pts = [
        (r["p_partkey"], math.floor(r["p_retailprice"] * 100 + 0.5), r["p_size"])
        for r in load(spark, sf_smoke, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in pts
            if q[0] != p[0]
        )

    expect = {p for p in pts if not dominated(p)}
    assert sky == expect


def test_lag_features_recount_one_user(spark, sf_smoke):
    """Lags and the trailing-3 mean recompute for a probe user; dow
    is in 0..6."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.prep import q_lag_features

    rows = q_lag_features(spark, sf_smoke).collect()
    assert rows and all(0 <= r["dow"] <= 6 for r in rows)
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    uid, urows = max(by_user.items(), key=lambda kv: len(kv[1]))
    ev = sorted(
        (
            (r["ts"], r["event_id"], math.floor(r["value"] * 100 + 0.5))
            for r in load(spark, sf_smoke, "events")
            .filter(f"user_id = {uid}")
            .select("ts", "event_id", "value")
            .collect()
        ),
    )
    by_eid = {r["event_id"]: r for r in urows}
    for i, (_, eid, cents) in enumerate(ev):
        r = by_eid[eid]
        assert r["cents"] == cents
        assert r["lag1_cents"] == (ev[i - 1][2] if i >= 1 else None)
        assert r["lag2_cents"] == (ev[i - 2][2] if i >= 2 else None)
        win = [c for _, _, c in ev[max(0, i - 2): i + 1]]
        assert r["trail3_mean_cents"] == sum(win) // len(win)
