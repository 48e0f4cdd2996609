"""Semantic property tests for the round-5k prep wave: collocations,
TWAP, quantile normalization, rare-label encode, delta encode,
weighted median."""

from __future__ import annotations

import math


def test_pmi_collocations_shape_and_recount(spark, sf_smoke):
    """Pairs are canonicalized (a <= b, a != b), ranks contiguous,
    and the lift formula recomputes from the emitted counts."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.llm import TOKS_SPARK
    from metoffice_spark.operators.nonparam import (  # noqa: F401 — same session
        q_ks_test,
    )
    from metoffice_spark.operators.prep import _PMI_TOP, q_pmi_collocations
    from pyspark.sql import functions as F

    rows = q_pmi_collocations(spark, sf_smoke).collect()
    assert rows and len(rows) <= _PMI_TOP
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    n_toks = (
        load(spark, sf_smoke, "documents")
        .select(F.explode(F.expr(TOKS_SPARK)).alias("t"))
        .count()
    )
    for r in rows:
        a, b = r["pair"].split(" ", 1)
        assert a < b
        assert r["lift_fp"] == (r["pair_cnt"] * n_toks * 1_000_000) // (
            r["cnt_a"] * r["cnt_b"]
        )
    lifts = [r["lift_fp"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_time_weighted_avg_recount_one_user(spark, sf_smoke):
    """Recompute the trapezoid for a probe user in plain Python."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.prep import q_time_weighted_avg

    rows = q_time_weighted_avg(spark, sf_smoke).collect()
    assert rows
    probe = rows[0]
    ev = sorted(
        (
            (int(r["ts"].timestamp()), math.floor(r["value"] * 100 + 0.5), r["event_id"])
            for r in load(spark, sf_smoke, "events")
            .filter(f"user_id = {probe['user_id']}")
            .select("ts", "value", "event_id")
            .collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert len(ev) == probe["n_obs"]
    num = sum(
        (ev[i][1] + ev[i + 1][1]) * (ev[i + 1][0] - ev[i][0])
        for i in range(len(ev) - 1)
    )
    span = ev[-1][0] - ev[0][0]
    assert probe["span_s"] == span
    assert probe["twap_fp"] == num // (2 * span)
    vals = [v for _, v, _ in ev]
    assert min(vals) <= probe["twap_fp"] <= max(vals)


def test_quantile_normalize_bounds_and_monotone(spark, sf_smoke):
    """Within a source: min maps to 0, max to 1e6, and pct is
    monotone in n_chars."""
    from collections import defaultdict

    from metoffice_spark.operators.prep import q_quantile_normalize

    rows = q_quantile_normalize(spark, sf_smoke).collect()
    assert rows
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append((r["n_chars"], r["pct_fp"]))
    for src, pairs in by_src.items():
        pairs.sort()
        assert pairs[0][1] == 0 or pairs[0][0] == pairs[1][0]
        assert 0 <= min(p for _, p in pairs) and max(p for _, p in pairs) <= 1_000_000
        # ties share a pct; otherwise strictly increasing
        for (x1, p1), (x2, p2) in zip(pairs, pairs[1:]):
            assert (x1 == x2 and p1 == p2) or (x1 < x2 and p1 < p2)


def test_rare_label_encode_partitions_rows(spark, sf_smoke):
    """Encoded rows sum to the table size; every kept label clears
    the relative threshold and __other__ members are all below it."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.prep import _RARE_PERMILLE, q_rare_label_encode

    rows = q_rare_label_encode(spark, sf_smoke).collect()
    n_total = load(spark, sf_smoke, "part").count()
    assert sum(r["n_rows"] for r in rows) == n_total
    others = [r for r in rows if r["is_other"] == 1]
    assert len(others) <= 1
    for r in rows:
        if r["is_other"] == 0:
            assert r["n_labels_merged"] == 1
            assert r["n_rows"] * 1000 >= _RARE_PERMILLE * n_total
        else:
            # merged labels each below threshold -> average below too
            assert r["n_rows"] * 1000 < _RARE_PERMILLE * n_total * r["n_labels_merged"]


def test_delta_encode_beats_raw_on_sequential_key(spark, sf_smoke):
    """o_orderkey is dense-sequential, so its delta bytes must be far
    below raw; every ratio is in (0, 1e6]; block math is exact."""
    from metoffice_spark.operators.prep import q_delta_encode

    rows = {r["colname"]: r for r in q_delta_encode(spark, sf_smoke).collect()}
    assert set(rows) == {"o_orderkey", "o_custkey", "o_orderdate_epoch"}
    for r in rows.values():
        assert r["raw_bytes"] == 8 * r["n_rows"]
        assert 0 < r["delta_bytes"] <= r["raw_bytes"]
        assert r["ratio_fp"] == (r["delta_bytes"] * 1_000_000) // r["raw_bytes"]
    # sequential key: ~1 byte/delta + 8/block -> ratio well under 0.25
    assert rows["o_orderkey"]["ratio_fp"] < 250_000


def test_weighted_median_recount(spark, sf_smoke):
    """Recompute the weighted median per flag in plain Python."""
    from collections import defaultdict

    from metoffice_spark.io import load
    from metoffice_spark.operators.prep import q_weighted_median

    rows = q_weighted_median(spark, sf_smoke).collect()
    li = load(spark, sf_smoke, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append(
            (math.floor(r["l_extendedprice"] * 100 + 0.5), int(r["l_quantity"]))
        )
    assert {r["l_returnflag"] for r in rows} == set(groups)
    for r in rows:
        vals = sorted(groups[r["l_returnflag"]])
        w_tot = sum(w for _, w in vals)
        assert r["w_tot"] == w_tot and r["n"] == len(vals)
        cum = 0
        for cents, w in vals:
            cum += w
            if 2 * cum >= w_tot:
                assert r["wmedian_cents"] == cents
                break


def test_5k_plan_shapes(spark, sf_smoke):
    """Scale locks: TWAP and weighted-median windows are keyed (no
    global sort of raw rows), rare-label broadcasts its total, delta
    encode is join-free."""
    from metoffice_spark.operators.prep import (
        q_delta_encode,
        q_rare_label_encode,
        q_time_weighted_avg,
        q_weighted_median,
    )

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    p = plan(q_time_weighted_avg(spark, sf_smoke))
    assert "Join" not in p and "CartesianProduct" not in p

    p = plan(q_weighted_median(spark, sf_smoke))
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p  # totals side

    p = plan(q_rare_label_encode(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p

    p = plan(q_delta_encode(spark, sf_smoke))
    assert "Join" not in p and "CartesianProduct" not in p
