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

# R06 ROTATION NOTE (for the next round's single rotation): after the
# r05 window below is graded, the never-driver-checked tail is (a) the
# 12 remaining r03 events-loader reds listed just past the window,
# (b) the round-5 late waves (collab_filter/winsorize/metric_decompose/
# ohlc_bars and the 5e-5i additions: stats.py x13, olap2.py x10,
# warehouse.py x3, curation2.py x3, q_random_projection,
# q_heavy_hitters_mg, q_funnel_latency; plus the 5j wave:
# nonparam.py x6 — q_ks_test, q_graph_bfs, q_feature_hashing,
# q_eval_ndcg, q_l_diversity, q_jackknife_var; plus the 5k wave:
# prep.py x6 — q_pmi_collocations, q_time_weighted_avg,
# q_quantile_normalize, q_rare_label_encode, q_delta_encode,
# q_weighted_median; plus the 5l wave: mining.py x6 —
# q_benford_test, q_spearman_corr, q_graph_kcore, q_als_step,
# q_cohort_ltv, q_text_keyphrase; plus the 5m/5n pairs —
# q_attribution_linear, q_simpson_check, q_split_temporal,
# q_null_imputation, q_rolling_regression, q_stream_twap,
# q_lorenz_curve, q_abc_classification, q_hhi_concentration,
# q_stream_anomaly, q_graph_modularity, q_er_blocking,
# q_graph_assortativity, q_gap_islands, q_stream_gap_detector,
# q_skyline_pareto, q_lag_features), all local-gate green at
# sf0.001 AND sf0.01. Prioritize (a) then (b) oldest-first.
# qids registered first, in this order (driver checks the first 50).
# Round-5 rotation (ONE rotation per round — the driver checks once at
# round end, so mid-round rotations burn the window on qids that never
# get a row). After r04 every qid had at least one driver row EXCEPT
# the 10 round-4b corpus/ingest qids (landed after the r04 window was
# fixed). Priorities: (1) those 10 never-checked qids; (2) FOUR
# representatives of the 16 r03 driver-reds of the events-loader
# class — the class shares ONE root cause, fixed in r04 (io.py
# schema-adaptive load, commit f00db15), already proven against the
# driver by q_rain_daily_delta/q_sketch_hll going green in r04; four
# more module-diverse representatives beat re-checking all 16 while
# 16 brand-new round-5 qids would sit rowless; (3) 36 round-5 qids
# (classify/behavior/sketches/linkage/evaluation/streaming waves).
# The remaining 12 events-loader reds and the oldest stale-green r01
# rows queue just past the window.
_PRIORITY = (
    # (1) round-4b corpus/ingest wave — never driver-checked
    "q_src_schema_merge",
    "q_lm_bigram_score",
    "q_repetition_ngram",
    "q_rank_rrf_fusion",
    "q_semdedup_centroid",
    "q_minhash_est_audit",
    "q_sample_reservoir",
    "q_dataset_card",
    "q_dedup_incremental",
    "q_fn_url_suite",
    # (2) r03 events-loader-red representatives (module-diverse)
    "q_agg_histogram",
    "q_ts_gapfill",
    "q_sketch_cms",
    "q_scd2_build",
    # (3) round-5 waves: classify / behavior / sketches / streaming
    "q_nb_langid",
    "q_quality_classifier",
    "q_dedup_lines",
    "q_bool_retrieval",
    "q_attribution",
    "q_markov_transitions",
    "q_ts_autocorr",
    "q_ts_changepoint",
    "q_cdc_apply",
    "q_sketch_setops",
    "q_sketch_hll_merge",
    "q_stream_static_join",
    "q_mmr_diversify",
    "q_win_rolling_median",
    "q_link_editdist",
    "q_skew_diag",
    "q_graph_triangles",
    "q_eval_pr",
    "q_ab_ztest",
    "q_multimodal_framesample",
    "q_fn_null_suite",
    "q_fn_datetime_suite",
    "q_stream_cagg",
    "q_hierarchy_expand",
    "q_ts_seasonal_profile",
    "q_pca_power",
    "q_stats_collect",
    "q_join_spatial",
    "q_behavior_e2e",
    "q_pattern_match",
    "q_percentile_cont",
    "q_win_range_interval",
    "q_agg_bitmap_distinct",
    "q_pseudonymize",
    "q_dp_release",
    "q_stream_cep",
    # --- driver window ends here (50) ---
    # newest round-5 qids queue first for the r06 rotation
    "q_collab_filter",
    "q_winsorize",
    "q_metric_decompose",
    "q_ohlc_bars",
    # remaining r03 events-loader reds (same proven root cause as the
    # four representatives above; local-gate green)
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
    # (4) re-checks queue just past the window, all exercised every
    # round by bench/entry anyway. q_rollup_hypertable (an events-
    # loader-class r03 red whose shared root cause was proven fixed by
    # the r04 representative rows) leads; then the oldest stale-green
    # r01 rows.
    "q_rollup_hypertable",
    "q_sink_http_form",
    "q_win_lag",
    "q_join_asof",
    "q_fn_array_map_json",
    "q_fn_dewpoint",
    "q_fn_winddir",
    "q_fn_baro_reduce",
    "q_rain_rate",
    "q_join_bucketed",
    "q_sink_partitioned",
    "q_src_multiformat",
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
