"""Lock the driver's 50-qid correctness window (registration order).

The driver grades the FIRST 50 registered qids each round; an
accidental reordering — a module added to _MODULES ahead of others, a
_PRIORITY edit, an import-order change — would silently burn the
round's verification window on the wrong queries. The window is
rotated deliberately ONCE per round; when rotating, update this list
in the same commit."""

from __future__ import annotations

from metoffice_spark.registry import all_queries

_R09_WINDOW = [
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
    "q_dq_checks",
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
]


def test_driver_window_is_exactly_the_planned_rotation():
    assert list(all_queries())[:50] == _R09_WINDOW


def test_registry_is_complete_and_fully_oracled():
    from metoffice_spark.registry import all_oracles

    qids = all_queries()
    assert len(qids) == 292
    assert set(all_oracles()) == set(qids)


def test_every_driver_unchecked_qid_is_queued_for_verification():
    """Any registered qid with NO row in any committed driver
    correctness record must sit in the pinned _PRIORITY front —
    either inside the current 50-qid window or in the staged rotation
    queue behind it. This catches the two ways the verification
    backlog silently leaks: registering an operator without queueing
    it, and dropping a still-unverified qid from the queue during a
    rotation."""
    import glob
    import json
    import os

    from metoffice_spark.registry import _PRIORITY

    root = os.path.join(os.path.dirname(__file__), "..")
    checked: set[str] = set()
    records = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert records, "driver correctness records missing from the repo"
    for path in records:
        with open(path) as f:
            checked.update(json.load(f))
    unqueued = [
        q for q in all_queries() if q not in checked and q not in set(_PRIORITY)
    ]
    assert unqueued == []
