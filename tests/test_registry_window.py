"""Lock the driver's 50-qid correctness window (registration order).

The driver grades the FIRST 50 registered qids each round; an
accidental reordering — a module added to _MODULES ahead of others, a
_PRIORITY edit, an import-order change — would silently burn the
round's verification window on the wrong queries. The window is
rotated deliberately ONCE per round; when rotating, update this list
in the same commit."""

from __future__ import annotations

from metoffice_spark.registry import all_queries

_R08_WINDOW = [
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
]


def test_driver_window_is_exactly_the_planned_rotation():
    assert list(all_queries())[:50] == _R08_WINDOW


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
