"""Lock the driver's 50-qid correctness window (registration order).

The driver grades the FIRST 50 registered qids each round; an
accidental reordering — a module added to _MODULES ahead of others, a
_PRIORITY edit, an import-order change — would silently burn the
round's verification window on the wrong queries. The window is
rotated deliberately ONCE per round; when rotating, update this list
in the same commit."""

from __future__ import annotations

from metoffice_spark.registry import all_queries

_R10_WINDOW = [
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
]


def test_driver_window_is_exactly_the_planned_rotation():
    assert list(all_queries())[:50] == _R10_WINDOW


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
