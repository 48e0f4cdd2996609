"""Semantic property tests for the §2.16 corpus-statistics wave
(operators/corpus.py). Bitwise oracle parity is covered by
tests/test_oracle_parity.py; these check the properties the oracles
cannot express (internal consistency, bounds, dedup invariants)."""

from __future__ import annotations

import pytest


def test_lm_bigram_score_bounds(spark, sf_smoke):
    """NLL is non-negative (Laplace p < 1 always), the average is the
    integer quotient, and every multi-token doc is scored."""
    from metoffice_spark.operators.corpus import q_lm_bigram_score

    rows = q_lm_bigram_score(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["nll_fp"] >= 0
        assert r["avg_nll_fp"] == r["nll_fp"] // r["n_bigrams"]


def test_repetition_ngram_invariants(spark, sf_smoke):
    """distinct <= total, dup fraction matches the counts exactly, and
    the top gram count is consistent with both."""
    from metoffice_spark.operators.corpus import q_repetition_ngram

    rows = q_repetition_ngram(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_grams"]
        assert r["dup_frac_fp"] == (
            1_000_000 * (r["n_grams"] - r["n_distinct"]) // r["n_grams"]
        )
        assert 1 <= r["top_gram_count"] <= r["n_grams"] - r["n_distinct"] + 1


def test_rrf_fusion_is_total_and_bounded(spark, sf_smoke):
    """Top-k is dense-ranked 1..k, fused scores are non-increasing,
    and each component rank contributes its exact fixed-point term."""
    from metoffice_spark.operators.corpus import _RRF_K, _RRF_TOPK, q_rank_rrf_fusion

    rows = sorted(q_rank_rrf_fusion(spark, sf_smoke).collect(), key=lambda r: r["rnk"])
    assert 0 < len(rows) <= _RRF_TOPK
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["rrf_fp"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["rrf_fp"] == 1_000_000 // (_RRF_K + r["rank_a"]) + 1_000_000 // (
            _RRF_K + r["rank_b"]
        )


def test_semdedup_keeps_one_representative_per_dup_group(spark, sf_smoke):
    """Every flagged group keeps exactly its min-vec_id member; no
    unflagged vector is ever dropped; cosine stays in [-1, 1]."""
    from collections import defaultdict

    from metoffice_spark.operators.corpus import q_semdedup_centroid

    rows = q_semdedup_centroid(spark, sf_smoke).collect()
    assert rows
    groups = defaultdict(list)
    for r in rows:
        assert -1.0 - 1e-9 <= r["cos_c"] <= 1.0 + 1e-9
        if not r["is_dup"]:
            assert r["keep"]
        else:
            groups[r["label"]].append(r)
    assert groups, "threshold flagged nothing — not exercising the dedup path"
    for label, members in groups.items():
        kept = [m for m in members if m["keep"]]
        assert len(kept) == 1, f"label {label}: {len(kept)} representatives"
        assert kept[0]["vec_id"] == min(m["vec_id"] for m in members)


def test_semdedup_centroid_broadcasts(spark, sf_smoke):
    """The centroid join must broadcast (labels x 1 rows) — shuffling
    the corpus embeddings on label would move everything for a tiny
    dimension table."""
    from metoffice_spark.operators.corpus import q_semdedup_centroid

    plan = (
        q_semdedup_centroid(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_audit_covers_planted_pairs_with_bounded_error(spark, sf_smoke):
    """Every planted near-dup pair is audited; exact Jaccard is high
    (the plant appends a 3-token suffix); the 12-slot estimate stays
    within 4 slots (~333334 fp) of exact on these high-sim pairs."""
    from metoffice_spark.operators.corpus import q_minhash_est_audit

    rows = q_minhash_est_audit(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["doc_b"] == r["doc_a"] + 100000
        assert r["doc_a"] % 25 == 0
        assert 0 <= r["est_fp"] <= 1_000_000
        assert 500_000 <= r["exact_fp"] < 1_000_000
        assert r["err_fp"] == abs(r["est_fp"] - r["exact_fp"])
        assert r["err_fp"] <= 400_000


def test_reservoir_sample_is_uniform_k_per_group(spark, sf_smoke):
    """Exactly min(K, group size) rows per lang, ranks dense 1..k, and
    the draw is reproducible (same sample on a re-run)."""
    from metoffice_spark.operators.corpus import _RES_K, q_sample_reservoir

    rows = q_sample_reservoir(spark, sf_smoke).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rnk"])
    for lang, rnks in by_lang.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= _RES_K
    again = {(r["lang"], r["doc_id"], r["rnk"])
             for r in q_sample_reservoir(spark, sf_smoke).collect()}
    assert again == {(r["lang"], r["doc_id"], r["rnk"]) for r in rows}


def test_dedup_incremental_merge_equals_batch(spark, sf_smoke):
    """Every survivor must be the full-corpus winner for its digest
    (merge == batch), and no survivor's digest may exist in the index."""
    from metoffice_spark.operators.corpus import q_dedup_incremental

    rows = q_dedup_incremental(spark, sf_smoke).collect()
    assert rows
    assert all(r["merge_eq_batch"] for r in rows)
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    classes = {r["survivor_class"] for r in rows}
    assert "new" in classes
