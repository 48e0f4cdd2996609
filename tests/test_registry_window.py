"""Lock the driver's 50-qid correctness window (registration order).

The driver grades the FIRST 50 registered qids each round; an
accidental reordering — a module added to _MODULES ahead of others, a
_PRIORITY edit, an import-order change — would silently burn the
round's verification window on the wrong queries. The window is
rotated deliberately ONCE per round; when rotating, update this list
in the same commit."""

from __future__ import annotations

from metoffice_spark.registry import all_queries

_R12_WINDOW = [
    "q_agg_distinct_twophase",
    "q_ann_pq",
    "q_anomaly_zscore",
    "q_chi2_terms",
    "q_cohort_retention",
    "q_cov_stats",
    "q_eval_auc",
    "q_fn_json_suite",
    "q_funnel_steps",
    "q_gini_spend",
    "q_graph_jaccard",
    "q_join_temporal",
    "q_kmeans_step",
    "q_metric_decompose",
    "q_mix_rebalance",
    "q_olap_avg_balance",
    "q_olap_cust_distribution",
    "q_olap_disjunctive",
    "q_olap_exists",
    "q_olap_having_in",
    "q_olap_important_stock",
    "q_olap_market_share",
    "q_olap_min_cost_supp",
    "q_olap_part_promotion",
    "q_olap_product_profit",
    "q_olap_promo_share",
    "q_olap_revenue_delta",
    "q_olap_scalar_subquery",
    "q_olap_ship_latency",
    "q_olap_top_supplier",
    "q_olap_volume_shipping",
    "q_olap_waiting_supplier",
    "q_percentile_exact",
    "q_pipeline_e2e",
    "q_ridge_normal",
    "q_rollup_hypertable",
    "q_sessionize_batch",
    "q_shard_assign",
    "q_sink_compact",
    "q_stream_anomaly",
    "q_stream_gap_detector",
    "q_stream_twap",
    "q_tfidf",
    "q_ts_interpolate",
    "q_udf_grouped_map",
    "q_win_ewma",
    "q_winsorize",
    "q_batch_length_buckets",
    "q_benford_test",
    "q_bpe_train",
]


def test_driver_window_is_exactly_the_planned_rotation():
    assert list(all_queries())[:50] == _R12_WINDOW


def test_registry_is_complete_and_fully_oracled():
    from metoffice_spark.registry import all_oracles

    qids = all_queries()
    assert len(qids) == 292
    assert set(all_oracles()) == set(qids)


def test_every_driver_unchecked_qid_is_queued_for_verification():
    """Any registered qid with NO row in any committed driver
    correctness record must sit in the pinned _PRIORITY front —
    either inside the current 50-qid window or in the staged rotation
    queue behind it. This catches the two ways the verification
    backlog silently leaks: registering an operator without queueing
    it, and dropping a still-unverified qid from the queue during a
    rotation."""
    import glob
    import json
    import os

    from metoffice_spark.registry import _PRIORITY

    root = os.path.join(os.path.dirname(__file__), "..")
    checked: set[str] = set()
    records = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert records, "driver correctness records missing from the repo"
    for path in records:
        with open(path) as f:
            checked.update(json.load(f))
    unqueued = [
        q for q in all_queries() if q not in checked and q not in set(_PRIORITY)
    ]
    assert unqueued == []
