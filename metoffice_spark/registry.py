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

# Round-11 rotation (ONE rotation per round; registry stays FROZEN at
# 292 qids). The window is ALL 49 qids whose latest driver row is
# r5-era — after this lands, no latest row predates r6 (the r10
# queue's "47 r5 + 3 r6" note undercounted: the VERDICT r10 age
# distribution is r5x49) — plus ONE fill: q_ohlc_bars, the r6-era
# query whose builder AND oracle changed this round (ADVICE r10 item
# 3: open/close struct picks now exclude NULL-v_fp rows; the changed-
# query precedent of ADVICE r08). The round's other changed query,
# q_rolling_regression (128-bit cross-term sums, latest row r8), and
# the obs substrate's new TIME-BOUNDS boundary (every stream/weather
# consumer, all r10-era rows) don't fit the 50 budget — both are
# pinned on their triggering slice in tests/test_degenerate_slices.py
# (TS_EXTREME_QIDS) and ride the committed full-registry sf0.01 +
# sf0.1 gates, the same treatment r10 gave q_funnel_steps.
_PRIORITY = (
    # --- R11: all 49 r5-era greens, alphabetical ---
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
    # --- R11 fill: the changed-this-round qid ---
    "q_ohlc_bars",
    # --- driver window ends here (50) ---
    # R12+ QUEUE: after this window lands, the oldest latest-rows are
    # the 47 remaining r6-era qids (q_ohlc_bars moved to r11);
    # alphabetical from q_agg_distinct_twophase, then r7.
    # The r10 window (all green in CORRECTNESS_r10) slides behind:
    "q_contamination_ngram",
    "q_dedup_components",
    "q_dedup_embed_cosine",
    "q_dedup_exact",
    "q_dedup_fuzzy",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_embed_quantize",
    "q_multimodal_cols",
    "q_multimodal_decode",
    "q_olap_local_supplier",
    "q_olap_order_priority",
    "q_olap_parts_suppliers",
    "q_olap_returned_items",
    "q_olap_shipping_priority",
    "q_pack_sequences",
    "q_quality_gopher",
    "q_rain_daily_delta",
    "q_sample_stratified",
    "q_sim_search",
    "q_sim_search_ivf",
    "q_sim_search_lsh",
    "q_sketch_hll",
    "q_split_train_val",
    "q_stream_dedup",
    "q_stream_ingest",
    "q_stream_join",
    "q_stream_session",
    "q_stream_sink",
    "q_stream_sliding",
    "q_stream_stateful",
    "q_stream_tumbling",
    "q_stream_watermark",
    "q_text_analysis",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_quality",
    "q_text_redact",
    "q_text_tokens",
    "q_text_vocab",
    "q_tokenize_ids",
    "q_udaf_grouped",
    "q_udf_scalar",
    "q_udtf",
    "q_dq_checks",
    "q_udf_cogrouped",
    "q_collab_filter",
    "q_weighted_median",
    "q_survival_hazard",
    "q_behavior_e2e",
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
