"""Semantic tests for the behavioral-analytics suite (percentile /
funnel / retention), PageRank, and negative sampling."""

from __future__ import annotations


def test_percentile_monotone(spark, sf_smoke):
    from metoffice_spark.operators.analytics import q_percentile_exact

    rows = q_percentile_exact(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_funnel_monotone(spark, sf_smoke):
    from metoffice_spark.operators.analytics import q_funnel_steps

    [r] = q_funnel_steps(spark, sf_smoke).collect()
    assert r["n_view_users"] >= r["n_click_users"] >= r["n_purchase_users"] > 0
    assert 0.0 <= r["purchase_rate"] <= 1.0


def test_retention_week_zero_is_full(spark, sf_smoke):
    """Every user is active in their own first week, so offset-0
    retention is exactly 1.0 for every cohort."""
    from metoffice_spark.operators.analytics import q_cohort_retention

    rows = q_cohort_retention(spark, sf_smoke).collect()
    assert rows
    zero = [r for r in rows if r["offset_weeks"] == 0]
    assert zero and all(r["n_active"] == r["cohort_size"] for r in zero)
    assert all(r["offset_weeks"] >= 0 for r in rows)


def test_pagerank_mass_and_positivity(spark, sf_smoke):
    """Integer truncation only ever drops mass: total rank is <= BASE
    but stays close; every node keeps a positive rank and appears
    exactly once."""
    from metoffice_spark.operators.scale import _PR_BASE, q_graph_pagerank

    rows = q_graph_pagerank(spark, sf_smoke).collect()
    assert len(rows) == len({r["node_id"] for r in rows})
    assert all(r["rank_fp"] > 0 for r in rows)
    total = sum(r["rank_fp"] for r in rows)
    assert 0.9 * _PR_BASE <= total <= _PR_BASE


def test_negative_sample_shape(spark, sf_smoke):
    from metoffice_spark.io import load
    from metoffice_spark.operators.pipeline import _NEG_K, q_negative_sample

    rows = q_negative_sample(spark, sf_smoke).collect()
    n_docs = load(spark, sf_smoke, "documents").count()
    assert len(rows) == n_docs * _NEG_K
    assert all(r["neg_doc_id"] != r["doc_id"] for r in rows)
    assert all(0 <= r["neg_doc_id"] < n_docs for r in rows)
    per_anchor: dict = {}
    for r in rows:
        per_anchor.setdefault(r["doc_id"], set()).add(r["slot"])
    assert all(slots == set(range(_NEG_K)) for slots in per_anchor.values())


def test_sessionize_batch_gap_property(spark, sf_smoke):
    """Within a user, consecutive sessions are separated by more than
    the gap; session ids are 1..n_sessions per user."""
    from metoffice_spark.operators.analytics import _SESS_GAP_MIN, q_sessionize_batch

    rows = q_sessionize_batch(spark, sf_smoke).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sessions in by_user.values():
        sessions.sort(key=lambda r: r["sid"])
        assert [r["sid"] for r in sessions] == list(range(1, len(sessions) + 1))
        for a, b in zip(sessions, sessions[1:]):
            gap = (b["t_start"] - a["t_end"]).total_seconds()
            assert gap > _SESS_GAP_MIN * 60 - 1  # integer-second truncation slack
        assert all(r["t_end"] >= r["t_start"] for r in sessions)


def test_distinct_twophase_equals_plain_count_distinct(spark, sf_smoke):
    from pyspark.sql import functions as F

    from metoffice_spark.io import load
    from metoffice_spark.operators.scale import q_agg_distinct_twophase

    got = {
        r["event_type"]: (r["n_users"], r["n_user_days"])
        for r in q_agg_distinct_twophase(spark, sf_smoke).collect()
    }
    ev = load(spark, sf_smoke, "events")
    want = {
        r["event_type"]: (r["u"], r["ud"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct("user_id", F.to_date("ts")).alias("ud"),
        )
        .collect()
    }
    assert got == want


def test_anomaly_zscore_flags_are_extreme(spark, sf_smoke):
    """Every flagged row really deviates: recompute each station's
    mean/std driver-side and confirm |x - mean| > 3 * std."""
    from metoffice_spark.obs import observations
    from metoffice_spark.operators.rain import q_anomaly_zscore

    flagged = q_anomaly_zscore(spark, sf_smoke).collect()
    import statistics

    obs = observations(spark, sf_smoke).select("station_id", "tempc").collect()
    by_st: dict = {}
    for r in obs:
        by_st.setdefault(r["station_id"], []).append(round(r["tempc"] * 100) / 100)
    for r in flagged:
        vals = by_st[r["station_id"]]
        mu = statistics.fmean(vals)
        sd = statistics.pstdev(vals)
        assert abs(r["temp_c"] - mu) > 2.9 * sd  # slack for fp rounding
        assert abs(r["z"]) > 3.0


def test_entropy_bounds(spark, sf_smoke):
    """0 <= H <= ln(n_distinct) (+fixed-point slack) for every lang."""
    import math

    from metoffice_spark.operators.text import q_text_entropy

    rows = q_text_entropy(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r["entropy_nats"] <= math.log(r["n_distinct"]) + 1e-3
        assert 0.0 <= r["entropy_ratio"] <= 1.0 + 1e-6
        assert r["n_distinct"] <= r["n_tokens"]
        # quantization lock: both doubles must be exact k/1e9 images —
        # the cross-engine ulp guard (operators/text.py _q9). If a
        # refactor drops the floor-quantize, v*1e9 drifts off-integer.
        for v in (r["entropy_nats"], r["entropy_ratio"]):
            if v is not None:
                assert abs(v * 1e9 - round(v * 1e9)) < 1e-3, v
