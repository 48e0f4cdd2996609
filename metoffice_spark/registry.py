"""qid → (query builder, oracle SQL | None) registry.

Backs ``__spark_entry__.py``: ``queries()`` / ``oracle_sql()`` are
projections of this dict. Modules register themselves by exposing a
``QUERIES`` mapping ``{qid: (builder, oracle_sql_or_None)}``.

Registration ORDER matters: the driver's per-round correctness gate
checks the first 50 registered qids. ``_PRIORITY`` pins the front of
the ordering to the operators that most need a hard driver signal this
round; the window rotates exactly once per round (see the _PRIORITY
comment), and new operators register AFTER the window so they never
silently displace a planned check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Operator modules, imported by name. A typo'd or broken module must
# fail LOUDLY: a silently skipped module shrinks the registry and the
# correctness gate reports green over a subset (ADVICE r02).
_MODULES = (
    "weather",
    "rain",
    "ingest",
    "relational",
    "analytics",
    "llm",
    "text",
    "udf",
    "streaming_batch",
    "pipeline",
    "scale",
    "quality",
    "temporal",
    "curation",
    "corpus",
    "classify",
    "behavior",
    "sketches",
    "linkage",
    "evaluation",
    "mlalgebra",
    "subqueries",
    "stats",
    "olap2",
    "warehouse",
    "curation2",
    "nonparam",
    "prep",
    "mining",
)

# Round-6 rotation (ONE rotation per round — the driver checks once at
# round end, so mid-round rotations burn the window on qids that never
# get a row). R06 is a VERIFICATION round: the operator registry is
# FROZEN at 292 qids and the window is spent converting local-green
# into driver-green. Priorities (VERDICT r05 item 1):
#   (1) the 13 qids whose ONLY driver row is a stale r03 FAIL from the
#       events-loader era — the sole reds in the driver's books; the
#       shared root cause (io.py schema-adaptive load, f00db15) was
#       proven fixed by the r04/r05 representative rows, but each qid
#       deserves its own green row;
#   (2) the 17 TPC-H-completion OLAP qids (subqueries.py x6,
#       olap2.py x10, q_olap_disjunctive) — the surface a relational-
#       engine user hits first, never driver-checked;
#   (3) the 3 streaming state machines + the 2 custom-UDF qids;
#   (4) the 4 oldest never-checked round-5 qids;
#   (5) 5 stats.py never-checked (oldest of the 5e wave);
#   (6) 6 re-window insurance picks (VERDICT item 4): events-era
#       r03-green rows that predate two testdata/code generations.
# The remaining 63 never-checked qids queue just past the window,
# oldest-wave-first, as the ready-made r07 rotation.
_PRIORITY = (
    # (1) stale r03 reds — the only FAILs in the driver's books
    "q_rollup_hypertable",
    "q_ts_interpolate",
    "q_percentile_exact",
    "q_funnel_steps",
    "q_cohort_retention",
    "q_sessionize_batch",
    "q_agg_distinct_twophase",
    "q_anomaly_zscore",
    "q_sink_compact",
    "q_join_temporal",
    "q_win_ewma",
    "q_cov_stats",
    "q_fn_json_suite",
    # (2) TPC-H completion tail — never driver-checked
    "q_olap_scalar_subquery",
    "q_olap_exists",
    "q_olap_having_in",
    "q_olap_top_supplier",
    "q_olap_market_share",
    "q_olap_avg_balance",
    "q_olap_min_cost_supp",
    "q_olap_revenue_delta",
    "q_olap_volume_shipping",
    "q_olap_product_profit",
    "q_olap_important_stock",
    "q_olap_ship_latency",
    "q_olap_cust_distribution",
    "q_olap_promo_share",
    "q_olap_part_promotion",
    "q_olap_waiting_supplier",
    "q_olap_disjunctive",
    # (3) streaming state machines + custom-UDF pair
    "q_stream_twap",
    "q_stream_anomaly",
    "q_stream_gap_detector",
    "q_udf_grouped_map",
    "q_udf_cogrouped",
    # (4) oldest never-checked round-5 qids
    "q_collab_filter",
    "q_winsorize",
    "q_metric_decompose",
    "q_ohlc_bars",
    # (5) stats.py 5e wave, oldest never-checked
    "q_eval_auc",
    "q_chi2_terms",
    "q_gini_spend",
    "q_ridge_normal",
    "q_graph_jaccard",
    # (6) re-window insurance: r01/r03-era greens two generations old
    "q_ann_pq",
    "q_tfidf",
    "q_kmeans_step",
    "q_shard_assign",
    "q_mix_rebalance",
    "q_pipeline_e2e",
    # --- driver window ends here (50) ---
    # R07 ROTATION QUEUE: the remaining never-checked qids, oldest
    # wave first. Rotate these into the front next round.
    # stats.py remainder (5e wave)
    "q_survival_hazard",
    "q_compress_dict",
    "q_sink_jsonl",
    "q_forecast_snaive",
    "q_target_encoding",
    "q_drift_chi2",
    "q_eval_multiclass",
    "q_text_readability",
    # warehouse.py (5f/5m waves)
    "q_rfm_segmentation",
    "q_event_paths",
    "q_dataset_fingerprint",
    "q_lorenz_curve",
    "q_abc_classification",
    "q_hhi_concentration",
    "q_skyline_pareto",
    # curation2.py
    "q_quality_ensemble",
    "q_hard_negatives",
    "q_span_corruption",
    # singles from the 5g-5i waves
    "q_random_projection",
    "q_heavy_hitters_mg",
    "q_funnel_latency",
    "q_knn_classify",
    "q_sketch_quantile",
    "q_er_blocking",
    # nonparam.py (5j wave)
    "q_ks_test",
    "q_graph_bfs",
    "q_feature_hashing",
    "q_eval_ndcg",
    "q_l_diversity",
    "q_jackknife_var",
    # prep.py (5k wave)
    "q_pmi_collocations",
    "q_time_weighted_avg",
    "q_quantile_normalize",
    "q_rare_label_encode",
    "q_delta_encode",
    "q_weighted_median",
    "q_split_temporal",
    "q_null_imputation",
    "q_lag_features",
    # mining.py (5l wave)
    "q_benford_test",
    "q_spearman_corr",
    "q_graph_kcore",
    "q_als_step",
    "q_cohort_ltv",
    "q_text_keyphrase",
    "q_simpson_check",
    "q_rolling_regression",
    "q_graph_modularity",
    "q_graph_assortativity",
    # behavior/quality/pipeline/relational/etc. never-checked tail
    "q_time_travel",
    "q_mad_outlier",
    "q_ts_trend",
    "q_attribution_linear",
    "q_gap_islands",
    "q_bloom_file_index",
    "q_profile_columns",
    "q_k_anonymity",
    "q_agg_cube",
    "q_fn_bitwise_suite",
    "q_batch_length_buckets",
    "q_mix_temperature",
    "q_sft_template",
    "q_pref_pairs",
    "q_bpe_train",
    "q_dedup_containment",
    "q_eval_rouge",
    "q_eval_calibration",
    "q_sample_coordinated",
)


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    modules = []
    for name in _MODULES:
        try:
            mod = __import__(f"metoffice_spark.operators.{name}", fromlist=["QUERIES"])
        except ModuleNotFoundError as e:
            # Only tolerate a genuinely missing OPTIONAL third-party
            # dependency; a missing/broken operator module is a bug.
            if e.name and e.name.startswith("metoffice_spark"):
                raise
            continue
        modules.append(mod)
    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in modules:
        for qid, spec in mod.QUERIES.items():
            if qid in merged:
                raise ValueError(f"duplicate qid {qid!r}")
            merged[qid] = spec
    ordered: dict[str, tuple[QueryFn, str | None]] = {}
    for qid in _PRIORITY:
        if qid in merged:
            ordered[qid] = merged.pop(qid)
    ordered.update(merged)
    return ordered


def all_queries() -> dict[str, QueryFn]:
    return {qid: fn for qid, (fn, _) in _collect().items()}

def all_oracles() -> dict[str, str]:
    return {qid: sql for qid, (_, sql) in _collect().items() if sql is not None}
