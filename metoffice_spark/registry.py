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
)

# qids registered first, in this order (driver checks the first 50).
# Positions 1-45: the qids with no driver correctness row as of r02
# (the r02-weak/rotated relational qids sit at 38-45 inside this
# block). Position 46: q_rollup_hypertable, driver-red in r02 (HUGEINT
# oracle type, fixed this round) — needs a fresh hard row to prove the
# fix. Positions 47-50 (the window's last four slots): the first
# round-3 pipeline qids; everything after position 50 rotates into the
# driver window in later rounds.
_PRIORITY = (
    # llm pipeline (dedup / similarity / multimodal / split)
    "q_dedup_exact",
    "q_dedup_fuzzy",
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
    # text analysis
    "q_text_analysis",
    "q_text_redact",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_text_fingerprint",
    "q_text_vocab",
    # udf surface
    "q_udf_scalar",
    "q_udaf_grouped",
    "q_udtf",
    # streaming suite
    "q_stream_ingest",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_watermark",
    "q_stream_stateful",
    "q_stream_sink",
    # olap composites
    "q_olap_shipping_priority",
    "q_olap_local_supplier",
    "q_olap_returned_items",
    "q_olap_order_priority",
    "q_olap_parts_suppliers",
    # round-2 relational additions never driver-checked
    "q_fn_array_map_json",
    "q_fn_date_extract",
    "q_pivot_unpivot",
    "q_merge_upsert",
    "q_join_salted",
    "q_sketch_distinct",
    "q_set_bag",
    "q_sql_ansi",
    # driver-red in r02, HUGEINT oracle fixed this round
    "q_rollup_hypertable",
    # round-3 training-pipeline additions (pipeline.py), never checked;
    # the last of these may fall outside the driver's 50-row window —
    # it rotates in next round.
    "q_quality_gopher",
    "q_pack_sequences",
    "q_contamination_ngram",
    "q_sample_stratified",
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
    # round-3 scale-technique qids (scale.py)
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
