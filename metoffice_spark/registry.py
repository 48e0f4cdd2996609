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

# Round-10 rotation (ONE rotation per round). Driver coverage closed
# at 292/292 in r08; the window stays pure re-verification insurance,
# oldest latest-row first. Registry stays FROZEN at 292 qids.
# Part A: ALL 44 r4-era greens — the llm.py dedup/sim-search family,
# the text.py family, the r4 streaming replays, the r4 pipeline/udf
# rows and the 5 OLAP flagships — whose latest driver rows predate
# THREE testdata/code generations (the queue named in r09's R10+
# note). Part B: 6 fill — the three queries whose builder or oracle
# CHANGED this round (ADVICE r08 precedent: a changed query needs a
# fresh driver row): q_dq_checks (empty-slice coalesce), q_udf_cogrouped
# (null-safe oracle fan-out join), q_collab_filter (lazy 1-row
# broadcast scalar), q_weighted_median + q_survival_hazard (the r10
# nullgroup probe's catches), q_behavior_e2e (the r10 composed-stress
# catch; its three co-catches q_funnel_steps / q_ohlc_bars /
# q_spearman_corr got the same one-line boundary, are pinned on their
# triggering slice in test_degenerate_slices.py, and ride the
# committed full-registry sf0.01+sf0.1 gates — window budget spent on
# the compositional bench headliner).
_PRIORITY = (
    # --- R10 Part A: all 44 r4-era greens ---
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
    # --- R10 Part B: the 6 changed-this-round qids ---
    "q_dq_checks",
    "q_udf_cogrouped",
    "q_collab_filter",
    "q_weighted_median",
    "q_survival_hazard",
    "q_behavior_e2e",
    # --- driver window ends here (50) ---
    # R11+ QUEUE: after this window lands, no latest driver row
    # predates r5. Next-oldest surviving greens: the remaining 47
    # r5-era rows (alphabetical from q_attribution), then r6.
    # The r09 window (all green in CORRECTNESS_r09) slides behind:
    "q_project_nested",
    "q_agg_distinct",
    "q_agg_grouping_sets",
    "q_agg_collect",
    "q_agg_stats",
    "q_join_outer",
    "q_join_semi_anti",
    "q_join_theta_range",
    "q_join_range_binned",
    "q_join_asof",
    "q_win_frame",
    "q_win_analytic",
    "q_topk",
    "q_set_union",
    "q_set_intersect",
    "q_set_except",
    "q_fn_math_suite",
    "q_fn_string_suite",
    "q_cdc_diff",
    "q_incr_agg",
    "q_topk_twophase",
    "q_join_bloom",
    "q_graph_pagerank",
    "q_layout_zorder",
    "q_join_bucketed",
    "q_interval_sweep",
    "q_win_distribution",
    "q_mode_agg",
    "q_text_chunk",
    "q_text_entropy",
    "q_text_boilerplate",
    "q_bpe_pair_count",
    "q_oov_rate",
    "q_embed_dimstats",
    "q_sample_weighted",
    "q_fn_regex_suite",
    "q_rank_bm25",
    "q_kmeans_train",
    "q_negative_sample",
    "q_sink_partitioned",
    "q_src_multiformat",
    "q_rfm_segmentation",
    "q_abc_classification",
    "q_pivot_unpivot",
    "q_merge_upsert",
    "q_join_salted",
    "q_sketch_distinct",
    "q_set_bag",
    "q_sql_ansi",
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
