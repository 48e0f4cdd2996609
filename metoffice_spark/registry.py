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
)

# qids registered first, in this order (driver checks the first 50).
# Round-4 rotation (VERDICT r03 item 4; exactly ONE rotation per round
# — the driver checks once at round end, so mid-round rotations burn
# the window on qids that never get a row): positions 1-47 are the 47
# qids with ZERO driver correctness rows across r01-r03 (the
# llm/text/udf/streaming/olap/reshaping tail — VERDICT r03
# "Driver-window accounting"). Positions 48-50 are re-check slots for
# the two r03 driver-reds fixed this round whose failure modes differ
# from the events-loader class (q_tokenize_ids: array-hashing in the
# driver's checker) plus two events-loader representatives
# (q_rain_daily_delta, q_sketch_hll) proving the io.py fix against the
# driver. The remaining r03 events-loader reds share the identical
# single root cause and are covered by the representatives + the local
# gate; they rotate into the r05 window.
_PRIORITY = (
    # §2.11 LLM dedup/similarity tail — never driver-checked
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
    "q_embed_quantize",
    # §2.11 text tail — never driver-checked
    "q_text_analysis",
    "q_text_redact",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_text_fingerprint",
    "q_text_vocab",
    # §2.10 UDF surface — never driver-checked
    "q_udf_scalar",
    "q_udaf_grouped",
    "q_udtf",
    # §2.9 streaming (batch-replay parity) — never driver-checked
    "q_stream_ingest",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_watermark",
    "q_stream_stateful",
    "q_stream_sink",
    # §2.12 OLAP composites — never driver-checked
    "q_olap_shipping_priority",
    "q_olap_local_supplier",
    "q_olap_returned_items",
    "q_olap_order_priority",
    "q_olap_parts_suppliers",
    # §2.8 reshaping + misc — never driver-checked
    "q_pivot_unpivot",
    "q_merge_upsert",
    "q_join_salted",
    "q_sketch_distinct",
    "q_set_bag",
    "q_sql_ansi",
    "q_split_train_val",
    # §2.13 curation quartet — never driver-checked
    "q_quality_gopher",
    "q_pack_sequences",
    "q_contamination_ngram",
    "q_sample_stratified",
    # re-check slots: r03 driver-reds fixed this round
    "q_tokenize_ids",
    "q_rain_daily_delta",
    "q_sketch_hll",
    # --- driver window ends here (50) ---
    # r03 events-loader reds (same root cause as the representatives
    # above; local-gate green after the io.py fix) — r05 window first.
    "q_agg_histogram",
    "q_ts_gapfill",
    "q_ts_interpolate",
    "q_sketch_cms",
    "q_percentile_exact",
    "q_funnel_steps",
    "q_cohort_retention",
    "q_sessionize_batch",
    "q_agg_distinct_twophase",
    "q_anomaly_zscore",
    "q_sink_compact",
    "q_scd2_build",
    "q_join_temporal",
    "q_win_ewma",
    "q_cov_stats",
    "q_fn_json_suite",
    "q_rollup_hypertable",
    # long-green events-path qids whose latest rows are stale (r01/r02)
    "q_sink_http_form",
    "q_win_lag",
    "q_join_asof",
    "q_fn_array_map_json",
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
