"""Semantic property tests for the round-5l mining wave: Benford,
Spearman, k-core, ALS step, cohort LTV, RAKE keyphrases."""

from __future__ import annotations

import math


def test_benford_shares_and_chi2(spark, sf_smoke):
    """Digits 1..9, observed counts sum to the table size, expected
    shares are the real log10(1+1/d) values and sum to ~1e6, and the
    chi2 term recomputes."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.mining import q_benford_test

    rows = q_benford_test(spark, sf_smoke).collect()
    n_orders = load(spark, sf_smoke, "orders").count()
    assert sum(r["obs"] for r in rows) == n_orders
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    share = 0
    for r in rows:
        assert r["benford_fp"] == round(1_000_000 * math.log10(1 + 1 / r["digit"]))
        share += r["benford_fp"]
        assert r["exp_fp"] == sum(x["obs"] for x in rows) * r["benford_fp"]
        expect = (r["obs"] * 1_000_000 - r["exp_fp"]) ** 2 / (r["exp_fp"] * 1e6)
        assert math.isclose(r["chi2_term"], expect, rel_tol=1e-12)
    if len(rows) == 9:
        assert abs(share - 1_000_000) <= 9  # rounding of 9 literals


def test_spearman_in_range_and_recount(spark, sf_smoke):
    """rho in [-1, 1]; recompute for one source with scipy-free
    Python ranks."""
    from collections import Counter

    from metoffice_spark.io import load
    from metoffice_spark.operators.llm import TOKS_SPARK
    from metoffice_spark.operators.mining import q_spearman_corr
    from pyspark.sql import functions as F

    rows = q_spearman_corr(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["rho"] <= 1.0
    probe = rows[0]
    data = (
        load(spark, sf_smoke, "documents")
        .filter(f"source = '{probe['source']}'")
        .select(
            F.col("n_chars").cast("bigint").alias("x"),
            F.expr(f"CAST(size({TOKS_SPARK}) AS BIGINT)").alias("y"),
        )
        .collect()
    )
    xs = [d["x"] for d in data]
    ys = [d["y"] for d in data]

    def avg2(vals):
        cnt = Counter(vals)
        # 2*avg rank = 2*min_rank + ties - 1
        order = sorted(cnt)
        min_rank, out = {}, {}
        seen = 0
        for v in order:
            min_rank[v] = seen + 1
            seen += cnt[v]
        for v in order:
            out[v] = 2 * min_rank[v] + cnt[v] - 1
        return [out[v] for v in vals]

    rx, ry = avg2(xs), avg2(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    expect = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert math.isclose(probe["rho"], expect, rel_tol=1e-12)


def test_kcore_monotone_shrink_and_min_degree(spark, sf_smoke):
    """Node/edge counts never grow across rounds, and after the final
    round every surviving node has degree >= k... unless the NEXT
    prune would still remove nodes (bounded rounds)."""
    from metoffice_spark.operators.mining import _KCORE_ROUNDS, q_graph_kcore

    rows = sorted(
        q_graph_kcore(spark, sf_smoke).collect(), key=lambda r: r["round"]
    )
    assert [r["round"] for r in rows] == list(range(1, _KCORE_ROUNDS + 1))
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
    for r in rows:
        # handshake: an undirected graph with n nodes of degree >= 1
        # has at least n/2 edges
        assert r["n_edges"] * 2 >= r["n_nodes"]


def test_als_step_is_weighted_projection(spark, sf_smoke):
    """u_fp is the ratings-weighted projection onto the item factor:
    recompute for one customer; factors bounded by data range."""
    from collections import defaultdict

    from metoffice_spark.io import load
    from metoffice_spark.operators.mining import _ALS_SCALE, q_als_step

    rows = q_als_step(spark, sf_smoke).collect()
    assert rows
    probe = rows[0]
    orders = load(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey).filter(
        f"o_custkey = {probe['o_custkey']}"
    ).collect()
    ratings = defaultdict(int)
    for r in joined:
        ratings[r["l_partkey"]] += int(r["l_quantity"])
    assert len(ratings) == probe["n_items"]
    num = sum(r * (pk % 7 + 1) * _ALS_SCALE for pk, r in ratings.items())
    den = sum(((pk % 7 + 1) * _ALS_SCALE) ** 2 for pk in ratings)
    assert probe["u_fp"] == (num * 1_000_000) // den


def test_cohort_ltv_cumulative_consistency(spark, sf_smoke):
    """cum_cents is the running sum of rev_cents per cohort; age 0
    exists for every cohort; totals match the orders table."""
    from collections import defaultdict

    from metoffice_spark.io import load
    from metoffice_spark.operators.mining import q_cohort_ltv

    rows = q_cohort_ltv(spark, sf_smoke).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_ym"]].append(r)
    total = 0
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age"])
        assert rs[0]["age"] == 0
        cum = 0
        for r in rs:
            cum += r["rev_cents"]
            assert r["cum_cents"] == cum
        total += cum
    expected_total = (
        load(spark, sf_smoke, "orders")
        .selectExpr("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) s")
        .collect()[0]["s"]
    )
    assert total == expected_total


def test_keyphrase_runs_are_stopword_free(spark, sf_smoke):
    """No stopword inside any phrase, lengths respect the cap, ranks
    contiguous, scores descending."""
    from metoffice_spark.operators.mining import (
        _RAKE_MAXLEN,
        _RAKE_STOP,
        q_text_keyphrase,
    )

    rows = q_text_keyphrase(spark, sf_smoke).collect()
    assert rows
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score_fp"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    stop = set(_RAKE_STOP)
    for r in rows:
        words = r["phrase"].split(" ")
        assert 1 <= len(words) <= _RAKE_MAXLEN
        assert len(words) == r["n_words"]
        assert not (set(words) & stop)


def test_5l_plan_shapes(spark, sf_smoke):
    """Scale locks: Benford/ALS are single-aggregate shapes with a
    broadcast total at most; cohort LTV windows over cells, not raw
    orders; kcore never caches an unbounded lineage."""
    from metoffice_spark.operators.mining import (
        q_als_step,
        q_benford_test,
        q_cohort_ltv,
        q_graph_kcore,
    )

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    p = plan(q_benford_test(spark, sf_smoke))
    assert "CartesianProduct" not in p
    assert p.count("Exchange hashpartitioning") <= 1

    p = plan(q_als_step(spark, sf_smoke))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    p = plan(q_cohort_ltv(spark, sf_smoke))
    assert "CartesianProduct" not in p

    p = plan(q_graph_kcore(spark, sf_smoke))
    assert "InMemoryTableScan" in p  # per-round persist barriers
