"""Lock the driver's 50-qid correctness window (registration order).

The driver grades the FIRST 50 registered qids each round; an
accidental reordering — a module added to _MODULES ahead of others, a
_PRIORITY edit, an import-order change — would silently burn the
round's verification window on the wrong queries. The window is
rotated deliberately ONCE per round; when rotating, update this list
in the same commit."""

from __future__ import annotations

from metoffice_spark.registry import all_queries

_R11_WINDOW = [
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
]


def test_driver_window_is_exactly_the_planned_rotation():
    assert list(all_queries())[:50] == _R11_WINDOW


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
