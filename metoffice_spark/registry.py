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
lookups). Scoped persists are retained across builder boundaries
(session.py scope queue, VERDICT r08 stretch item 8): a frame's
cached plan survives until _RETAIN_SCOPES newer builders have
started, so drivers may freely interleave builds and executions; a
scope that falls off the retention queue merely recomputes — always
correct, just no longer exchange-free.
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

# Round-12 rotation (ONE rotation per round; registry stays FROZEN at
# 292 qids). The window is ALL 47 qids whose latest driver row is
# r6-era (q_ohlc_bars moved to r11 last round) plus THREE fills: the
# alphabetically-first r7-era qids (q_batch_length_buckets,
# q_benford_test, q_bpe_train). After this lands no latest row
# predates r7, and the window matches the queue pinned in the r11
# registry comment and VERDICT r11 item 1. Window membership was
# recomputed programmatically from CORRECTNESS_r01..r11 latest-row
# ages (age dist at r11 head: r6x47 r7x46 r8x50 r9x49 r10x50 r11x50);
# no builder or oracle changed between the r11 gate and this rotation,
# so there is no changed-query fill this round.
_PRIORITY = (
    # --- R12: all 47 r6-era greens, alphabetical ---
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
    # --- R12 fills: the 3 alphabetically-first r7-era qids ---
    "q_batch_length_buckets",
    "q_benford_test",
    "q_bpe_train",
    # --- driver window ends here (50) ---
    # R13+ QUEUE: after this window lands, the oldest latest-rows
    # are the 43 remaining r7-era qids (alphabetical from
    # q_compress_dict), then r8.
    # The r11 window (all green in CORRECTNESS_r11) slides behind:
    "q_ab_ztest",
    "q_agg_bitmap_distinct",
    "q_agg_histogram",
    "q_attribution",
    "q_bool_retrieval",
    "q_cdc_apply",
    "q_dataset_card",
    "q_dedup_incremental",
    "q_dedup_lines",
    "q_dp_release",
    "q_eval_pr",
    "q_fn_datetime_suite",
    "q_fn_null_suite",
    "q_fn_url_suite",
    "q_graph_triangles",
    "q_hierarchy_expand",
    "q_join_spatial",
    "q_link_editdist",
    "q_lm_bigram_score",
    "q_markov_transitions",
    "q_minhash_est_audit",
    "q_mmr_diversify",
    "q_multimodal_framesample",
    "q_nb_langid",
    "q_pattern_match",
    "q_pca_power",
    "q_percentile_cont",
    "q_pseudonymize",
    "q_quality_classifier",
    "q_rank_rrf_fusion",
    "q_repetition_ngram",
    "q_sample_reservoir",
    "q_scd2_build",
    "q_semdedup_centroid",
    "q_sketch_cms",
    "q_sketch_hll_merge",
    "q_sketch_setops",
    "q_skew_diag",
    "q_src_schema_merge",
    "q_stats_collect",
    "q_stream_cagg",
    "q_stream_cep",
    "q_stream_static_join",
    "q_ts_autocorr",
    "q_ts_changepoint",
    "q_ts_gapfill",
    "q_ts_seasonal_profile",
    "q_win_range_interval",
    "q_win_rolling_median",
    "q_ohlc_bars",
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
