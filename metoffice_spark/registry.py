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

# Round-9 rotation (ONE rotation per round — the driver checks once at
# round end, so mid-round rotations burn the window on qids that never
# get a row). Driver coverage closed at 292/292 in r08; from here the
# window is pure re-verification insurance, oldest latest-row first
# (VERDICT r08 item 1). Registry stays FROZEN at 292 qids. Part A: the
# 18 r02-era relational greens whose rows predate two testdata/code
# generations (the queue named in r08's R09+ note); Part B: all 24
# r03-era greens; Part C: 8 fill — the two warehouse qids whose NULL
# rank-validity boundary changed this round (ADVICE r08: a changed
# query needs a fresh driver row) + the 6 oldest-r4 relational rows.
_PRIORITY = (
    # --- R09 Part A: r02-era relational remainder x18 ---
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
    # --- R09 Part B: the 24 r03-era greens ---
    # quality.py r03 x2
    "q_dq_checks",
    "q_cdc_diff",
    # scale.py r03 x5
    "q_incr_agg",
    "q_topk_twophase",
    "q_join_bloom",
    "q_graph_pagerank",
    "q_layout_zorder",
    # relational.py r03 x1
    "q_join_bucketed",
    # temporal.py r03 x3
    "q_interval_sweep",
    "q_win_distribution",
    "q_mode_agg",
    # text.py r03 x2
    "q_text_chunk",
    "q_text_entropy",
    # curation.py r03 x7
    "q_text_boilerplate",
    "q_bpe_pair_count",
    "q_oov_rate",
    "q_embed_dimstats",
    "q_sample_weighted",
    "q_fn_regex_suite",
    "q_rank_bm25",
    # pipeline.py r03 x2
    "q_kmeans_train",
    "q_negative_sample",
    # ingest.py r03 x2
    "q_sink_partitioned",
    "q_src_multiformat",
    # --- R09 Part C: 8 fill ---
    # changed this round (ADVICE r08 NULL rank-validity boundary)
    "q_rfm_segmentation",
    "q_abc_classification",
    # oldest-r4 relational re-windows
    "q_pivot_unpivot",
    "q_merge_upsert",
    "q_join_salted",
    "q_sketch_distinct",
    "q_set_bag",
    "q_sql_ansi",
    # --- driver window ends here (50) ---
    # R10+ QUEUE: after this window lands, no latest driver row
    # predates r4. Next-oldest surviving greens for continued
    # insurance: the r4-era llm.py dedup/sim-search family
    # (q_dedup_exact q_dedup_fuzzy q_sim_search q_sim_search_lsh
    # q_multimodal_cols q_dedup_simhash q_dedup_ngram_jaccard
    # q_dedup_embed_cosine q_sim_search_ivf q_multimodal_decode
    # q_split_train_val q_dedup_components q_embed_quantize), the r4
    # text.py family, the r4 streaming_batch replays, and the r4
    # pipeline/udf rows — then r5.
    # The r08 window (all green in CORRECTNESS_r08) slides behind:
    "q_graph_kcore",
    "q_als_step",
    "q_cohort_ltv",
    "q_text_keyphrase",
    "q_simpson_check",
    "q_rolling_regression",
    "q_graph_modularity",
    "q_graph_assortativity",
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
    "q_fn_array_map_json",
    "q_fn_date_extract",
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
    "q_fn_str_locate",
    "q_sink_error_alert",
    "q_sink_http_form",
    "q_src_json_rest",
    "q_src_text_scrape",
    "q_join_state_lookup",
    "q_rain_rate",
    "q_sink_state_upsert",
    "q_src_state_table",
    "q_win_first_of_day",
    "q_win_lag",
    "q_scan_parquet",
    "q_filter_predicate",
    "q_project_compute",
    "q_agg_hash",
    "q_join_broadcast",
    "q_join_shuffle",
    "q_win_rank",
    "q_sort",
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
