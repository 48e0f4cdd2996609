"""qid → (query builder, oracle SQL | None) registry.

Backs ``__spark_entry__.py``: ``queries()`` / ``oracle_sql()`` are
projections of this dict. Modules register themselves by exposing a
``QUERIES`` mapping ``{qid: (builder, oracle_sql_or_None)}``.

Registration ORDER matters: the driver's per-round correctness gate
checks the first 50 registered qids. ``_PRIORITY`` pins the front of
the ordering to the operators that most need a hard driver signal this
round — in round 2 the gate landed on the long-green relational core
while the entire llm/text/udf/streaming/analytics tail went unchecked
(VERDICT r02 "What's missing" #1), so round 3 front-loads exactly that
tail plus the re-fixed q_rollup_hypertable.
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
)

# qids registered first, in this order (driver checks the first 50).
# Round-4 rotation: positions 1-29 are the qids with no driver
# correctness row after r03 (r03's window covered its priority
# positions 1-50; these sat at 51-79). Positions 30+: the round-4
# additions (temporal / curation modules), then re-verification slots
# for the most-reworked long-green qids. Everything else has a hard
# driver row from r01-r03 and registers after the window.
_PRIORITY = (
    # round-3 training-pipeline tail never driver-checked (r03 pos 51+)
    "q_tfidf",
    "q_kmeans_step",
    "q_shard_assign",
    "q_mix_rebalance",
    "q_sink_partitioned",
    "q_join_bucketed",
    "q_pipeline_e2e",
    "q_agg_histogram",
    "q_kmeans_train",
    "q_ts_gapfill",
    # round-3 scale-technique qids (scale.py), never driver-checked
    "q_incr_agg",
    "q_topk_twophase",
    "q_join_bloom",
    "q_sketch_cms",
    "q_ts_interpolate",
    "q_text_chunk",
    "q_percentile_exact",
    "q_funnel_steps",
    "q_cohort_retention",
    "q_graph_pagerank",
    "q_negative_sample",
    "q_src_multiformat",
    "q_sessionize_batch",
    "q_agg_distinct_twophase",
    "q_anomaly_zscore",
    "q_text_entropy",
    "q_sink_compact",
    "q_dq_checks",
    "q_cdc_diff",
    # round-4 additions (temporal.py / curation.py) register here as
    # they land — inside the window for a first-round hard signal.
    "q_scd2_build",
    "q_join_temporal",
    "q_interval_sweep",
    "q_win_ewma",
    "q_win_distribution",
    "q_mode_agg",
    "q_cov_stats",
    "q_text_boilerplate",
    "q_bpe_pair_count",
    "q_oov_rate",
    "q_embed_dimstats",
    "q_sample_weighted",
    "q_ann_pq",
    "q_fn_json_suite",
    "q_fn_regex_suite",
    "q_layout_zorder",
    "q_sketch_hll",
    "q_tokenize_ids",
    "q_rank_bm25",
    # re-verification: the r02-red rollup (HUGEINT oracle, fixed r03)
    # and the most-reworked substrate query (r03 exchange-reuse)
    "q_rollup_hypertable",
    "q_rain_daily_delta",
    # --- driver window ends here (50) ---
    "q_sink_http_form",
    "q_win_lag",
    "q_dedup_fuzzy",
    # previously front-loaded r03 window, all with hard r03 rows
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_embed_cosine",
    "q_dedup_components",
    "q_sim_search",
    "q_sim_search_ivf",
    "q_sim_search_lsh",
    "q_multimodal_cols",
    "q_multimodal_decode",
    "q_split_train_val",
    "q_embed_quantize",
    "q_text_analysis",
    "q_text_redact",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_text_fingerprint",
    "q_text_vocab",
    "q_udf_scalar",
    "q_udaf_grouped",
    "q_udtf",
    "q_stream_ingest",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_watermark",
    "q_stream_stateful",
    "q_stream_sink",
    "q_olap_shipping_priority",
    "q_olap_local_supplier",
    "q_olap_returned_items",
    "q_olap_order_priority",
    "q_olap_parts_suppliers",
    "q_fn_array_map_json",
    "q_fn_date_extract",
    "q_pivot_unpivot",
    "q_merge_upsert",
    "q_join_salted",
    "q_sketch_distinct",
    "q_set_bag",
    "q_sql_ansi",
    "q_quality_gopher",
    "q_pack_sequences",
    "q_contamination_ngram",
    "q_sample_stratified",
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
