"""Semantic property tests for the round-5j nonparametric wave:
KS test, graph BFS, feature hashing, NDCG, l-diversity, jackknife."""

from __future__ import annotations

import math


def test_ks_test_matches_recount(spark, sf_smoke):
    """Recompute D for one source with plain Python ECDFs and compare
    fixed-point values; KS is within [0, 1e6]."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.nonparam import q_ks_test

    rows = q_ks_test(spark, sf_smoke).collect()
    assert rows
    probe = rows[0]
    docs = [
        (r["n_chars"], r["lang"] == "en")
        for r in load(spark, sf_smoke, "documents")
        .filter(f"source = '{probe['source']}'")
        .select("n_chars", "lang")
        .collect()
    ]
    a = sorted(x for x, isen in docs if isen)
    b = sorted(x for x, isen in docs if not isen)
    assert (len(a), len(b)) == (probe["n_a"], probe["n_b"])
    xs = sorted(set(a) | set(b))
    d_num = max(
        abs(
            sum(1 for v in a if v <= x) * len(b)
            - sum(1 for v in b if v <= x) * len(a)
        )
        for x in xs
    )
    assert probe["ks_fp"] == (d_num * 1_000_000) // (len(a) * len(b))
    for r in rows:
        assert 0 <= r["ks_fp"] <= 1_000_000


def test_graph_bfs_levels_alternate_bipartite(spark, sf_smoke):
    """The graph is bipartite (customers >= 0, suppliers < 0): odd
    levels are all suppliers, even levels all customers; level 0 is
    exactly the seed; counts are positive and levels contiguous."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.nonparam import _BFS_MAX_LEVEL, q_graph_bfs

    rows = {r["level"]: r for r in q_graph_bfs(spark, sf_smoke).collect()}
    seed = load(spark, sf_smoke, "orders").agg({"o_custkey": "min"}).collect()[0][0]
    assert rows[0]["n_nodes"] == 1
    assert rows[0]["min_node"] == rows[0]["max_node"] == seed
    assert set(rows) == set(range(min(_BFS_MAX_LEVEL + 1, max(rows) + 1)))
    for lvl, r in rows.items():
        assert r["n_nodes"] >= 1
        if lvl % 2 == 1:
            assert r["max_node"] < 0, "odd level must be suppliers"
        else:
            assert r["min_node"] >= 0, "even level must be customers"


def test_feature_hashing_conserves_tokens(spark, sf_smoke):
    """Bucket counts in the feats string sum to n_toks, buckets are
    sorted, in range, and n_toks matches the tokenizer's count."""
    from pyspark.sql import functions as F

    from metoffice_spark.io import load
    from metoffice_spark.operators.llm import TOKS_SPARK
    from metoffice_spark.operators.nonparam import _FH_BUCKETS, q_feature_hashing

    rows = q_feature_hashing(spark, sf_smoke).collect()
    assert rows
    expected = {
        r["doc_id"]: r["n"]
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", F.expr(f"size({TOKS_SPARK})").alias("n"))
        .collect()
    }
    for r in rows[:200]:
        parts = [p.split(":") for p in r["feats"].split("|")]
        buckets = [int(b) for b, _ in parts]
        assert buckets == sorted(buckets)
        assert all(0 <= b < _FH_BUCKETS for b in buckets)
        assert sum(int(c) for _, c in parts) == r["n_toks"] == expected[r["doc_id"]]


def test_eval_ndcg_bounds_and_perfect_ranker(spark, sf_smoke):
    """ndcg_fp is in [0, 1e6]; idcg matches the discount prefix table;
    dcg never exceeds idcg."""
    from metoffice_spark.operators.nonparam import (
        _NDCG_IDEAL,
        _NDCG_K,
        q_eval_ndcg,
    )

    rows = q_eval_ndcg(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        k = min(r["n_pos"], _NDCG_K)
        assert r["idcg_fp"] == _NDCG_IDEAL[k]
        assert 0 <= r["dcg_fp"] <= r["idcg_fp"]
        assert 0 <= r["ndcg_fp"] <= 1_000_000
        assert r["ndcg_fp"] == (r["dcg_fp"] * 1_000_000) // r["idcg_fp"]


def test_discount_table_is_log2(spark):
    """The embedded literals really are round(1e6/log2(p+1))."""
    from metoffice_spark.operators.nonparam import _NDCG_DISC

    for p, d in enumerate(_NDCG_DISC, start=1):
        assert d == round(1_000_000 / math.log2(p + 1))
    assert _NDCG_DISC[0] == 1_000_000  # log2(2) = 1


def test_l_diversity_accounts_every_customer(spark, sf_smoke):
    """Histogram row counts sum to the customer count; l never exceeds
    the number of market segments; below_l flags match l."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.nonparam import _L_DIVERSE, q_l_diversity

    rows = q_l_diversity(spark, sf_smoke).collect()
    n_cust = load(spark, sf_smoke, "customer").count()
    n_seg = (
        load(spark, sf_smoke, "customer").select("c_mktsegment").distinct().count()
    )
    assert sum(r["n_rows"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["l"] <= n_seg
        assert r["below_l"] == (1 if r["l"] < _L_DIVERSE else 0)
        assert r["n_classes"] >= 1 and r["n_rows"] >= r["n_classes"]


def test_jackknife_terms_recount(spark, sf_smoke):
    """Leave-one-out means and variance terms match a local recount
    over the per-priority sums."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.nonparam import q_jackknife_var

    rows = q_jackknife_var(spark, sf_smoke).collect()
    orders = load(spark, sf_smoke, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    sums: dict = {}
    for r in orders:
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        s, n = sums.get(r["o_orderpriority"], (0, 0))
        sums[r["o_orderpriority"]] = (s + cents, n + 1)
    g = len(sums)
    s_tot = sum(s for s, _ in sums.values())
    n_tot = sum(n for _, n in sums.values())
    thetas = {
        k: ((s_tot - s) * 100) // (n_tot - n) for k, (s, n) in sums.items()
    }
    sum_theta = sum(thetas.values())
    assert len(rows) == g
    for r in rows:
        th = thetas[r["o_orderpriority"]]
        assert r["theta_fp"] == th
        expect = (
            float(g * th - sum_theta) ** 2 * float(g - 1) / float(g) ** 3
        )
        assert math.isclose(r["jk_term"], expect, rel_tol=1e-12)


def test_5j_plan_shapes(spark, sf_smoke):
    """Scale locks: KS/NDCG windows are partitioned (no global-sort
    WindowExec warning path), feature hashing is join-free, jackknife
    broadcasts its 1-row total."""
    from metoffice_spark.operators.nonparam import (
        q_eval_ndcg,
        q_feature_hashing,
        q_jackknife_var,
        q_ks_test,
    )

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    p = plan(q_feature_hashing(spark, sf_smoke))
    assert "Join" not in p and "CartesianProduct" not in p

    p = plan(q_ks_test(spark, sf_smoke))
    assert "windowspecdefinition(source" in p  # window keyed on source
    assert "CartesianProduct" not in p

    p = plan(q_eval_ndcg(spark, sf_smoke))
    assert "CartesianProduct" not in p

    p = plan(q_jackknife_var(spark, sf_smoke))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
