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

Builder contract (ADVICE r06, refined VERDICT r07 item 6): builders
are NOT guaranteed side-effect-free, but expensive side effects are
gated behind FIRST EXECUTION. q_rollup_hypertable materializes its
continuous-aggregate levels (persist + count) so the cached
(station_id, day) partitioning is statically known and the rollup
tree plans with zero extra exchanges — since r08 that refresh runs on
the returned frame's first ACTION (session.refresh_on_first_action),
not at build time, so plan-only consumers (plan walkers, audit tools)
build frames job-free. A builder may still run bounded setup scalars
(q_graph_pagerank's nodes.count(), the streaming replays' max-ts
lookups). The zero-exchange executed plan relies on the builder's
scoped persists still being cached — calling ANOTHER builder (whose
tune() releases scoped persists) before executing the frame degrades
the plan to recompute. Build → inspect/execute → then build the next
query.
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

# Round-8 rotation (ONE rotation per round — the driver checks once at
# round end, so mid-round rotations burn the window on qids that never
# get a row). R08 closes the book: the registry stays FROZEN at 292
# qids and the window is the queue VERDICT r07 item 1 ordered — Part A:
# the LAST 18 never-driver-checked qids (after this window lands,
# cumulative driver coverage reads 292/292); Part B: 32 re-window
# insurance picks, the oldest surviving greens (two r01 rows plus the
# r02-era weather/ingest/rain/relational rows that predate two
# testdata/code generations).
_PRIORITY = (
    # --- R08 Part A: the final 18 never-checked qids ---
    # mining.py remainder (5l wave)
    "q_graph_kcore",
    "q_als_step",
    "q_cohort_ltv",
    "q_text_keyphrase",
    "q_simpson_check",
    "q_rolling_regression",
    "q_graph_modularity",
    "q_graph_assortativity",
    # behavior/quality/relational never-checked tail
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
    # --- R08 Part B: 32 oldest-green re-windows ---
    # r01-era rows
    "q_fn_array_map_json",
    "q_fn_date_extract",
    # weather.py r02 x11
    "q_fn_dewpoint",
    "q_fn_winddir",
    "q_fn_mast_corr",
    "q_fn_baro_reduce",
    "q_case_when",
    "q_fn_units",
    "q_fn_round_fixed",
    "q_fn_date_fmt",
    "q_fn_epoch2ts",
    "q_fn_concat",
    "q_fn_num_coerce",
    # ingest.py r02 x5
    "q_fn_str_locate",
    "q_sink_error_alert",
    "q_sink_http_form",
    "q_src_json_rest",
    "q_src_text_scrape",
    # rain.py r02 x6
    "q_join_state_lookup",
    "q_rain_rate",
    "q_sink_state_upsert",
    "q_src_state_table",
    "q_win_first_of_day",
    "q_win_lag",
    # relational.py r02 x8
    "q_scan_parquet",
    "q_filter_predicate",
    "q_project_compute",
    "q_agg_hash",
    "q_join_broadcast",
    "q_join_shuffle",
    "q_win_rank",
    "q_sort",
    # --- driver window ends here (50) ---
    # R09+ QUEUE: with this window green, every one of the 292 qids has
    # a driver row (VERDICT r07's "one more round closes the book").
    # Next-oldest surviving greens if re-window insurance continues:
    # the r02 relational remainder (q_project_nested q_agg_distinct
    # q_agg_grouping_sets q_agg_collect q_agg_stats q_join_outer
    # q_join_semi_anti q_join_theta_range q_join_range_binned
    # q_join_asof q_win_frame q_win_analytic q_topk q_set_union
    # q_set_intersect q_set_except q_fn_math_suite q_fn_string_suite),
    # then the r03-era quality/scale/curation rows.
    # The r07 window (all green in CORRECTNESS_r07) slides behind:
    "q_survival_hazard",
    "q_compress_dict",
    "q_sink_jsonl",
    "q_forecast_snaive",
    "q_target_encoding",
    "q_drift_chi2",
    "q_eval_multiclass",
    "q_text_readability",
    "q_rfm_segmentation",
    "q_event_paths",
    "q_dataset_fingerprint",
    "q_lorenz_curve",
    "q_abc_classification",
    "q_hhi_concentration",
    "q_skyline_pareto",
    "q_quality_ensemble",
    "q_hard_negatives",
    "q_span_corruption",
    "q_random_projection",
    "q_heavy_hitters_mg",
    "q_funnel_latency",
    "q_knn_classify",
    "q_sketch_quantile",
    "q_er_blocking",
    "q_ks_test",
    "q_graph_bfs",
    "q_feature_hashing",
    "q_eval_ndcg",
    "q_l_diversity",
    "q_jackknife_var",
    "q_pmi_collocations",
    "q_time_weighted_avg",
    "q_quantile_normalize",
    "q_rare_label_encode",
    "q_delta_encode",
    "q_weighted_median",
    "q_split_temporal",
    "q_null_imputation",
    "q_lag_features",
    "q_benford_test",
    "q_spearman_corr",
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
