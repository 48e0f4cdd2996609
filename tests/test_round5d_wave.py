"""Semantic property tests for the round-5d wave: subquery OLAP
shapes (plan side in test_plans.py), MAD outliers, ROUGE pair
scoring, containment dedup, and SFT chat templating. Bitwise oracle
parity is covered by tests/test_oracle_parity.py; these check the
properties the oracles cannot express."""

from __future__ import annotations

import hashlib
import re


def test_mad_outlier_robustness_bounds(spark, sf_smoke):
    """By construction of the two medians: at least half of each type
    sits within one MAD, so the >3-MAD tail can never reach 50%; the
    share is the exact quotient; the median matches a direct
    lower-median recount."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.behavior import q_mad_outlier

    rows = {r["event_type"]: r for r in q_mad_outlier(spark, sf_smoke).collect()}
    ev = load(spark, sf_smoke, "events").select("event_type", "value").collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(
            int(r["value"] * 100 + 0.5)
        )
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        r = rows[t]
        assert r["n"] == len(vals)
        vals.sort()
        assert r["median"] == vals[(len(vals) + 1) // 2 - 1] / 100.0
        assert r["n_outliers"] <= r["n"] // 2
        assert r["outlier_share"] == r["n_outliers"] / r["n"]


def test_eval_rouge_bounds_and_recount(spark, sf_smoke):
    """Overlaps are bounded by both lengths, scores sit in [0, 1],
    and one pair's ROUGE-1 overlap matches a direct Python multiset
    recount."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.evaluation import q_eval_rouge

    rows = q_eval_rouge(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r["ov1"] <= min(r["na1"], r["nb1"])
        assert 0 <= r["ov2"] <= min(r["na2"], r["nb2"]) or r["ov2"] == 0
        assert 0.0 <= r["rouge1_f"] <= 1.0
        assert 0.0 <= r["rouge2_f"] <= 1.0
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    }

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

    probe = rows[0]
    ca: dict = {}
    cb: dict = {}
    for t in toks(texts[probe["doc_a"]]):
        ca[t] = ca.get(t, 0) + 1
    for t in toks(texts[probe["doc_b"]]):
        cb[t] = cb.get(t, 0) + 1
    ov = sum(min(n, cb.get(t, 0)) for t, n in ca.items())
    assert probe["ov1"] == ov
    assert probe["na1"] == sum(ca.values())
    assert probe["nb1"] == sum(cb.values())


def test_containment_flags_planted_excerpts(spark, sf_smoke):
    """Every planted excerpt (doc_id + 200000) must be recalled as a
    candidate and verified with containment ~1 in the excerpt
    direction; intersections never exceed either set."""
    from metoffice_spark.operators.llm import q_dedup_containment

    rows = q_dedup_containment(spark, sf_smoke).collect()
    assert rows
    planted = [r for r in rows if r["doc_b"] == r["doc_a"] + 200000]
    assert planted, "no planted excerpt pair recalled"
    for r in planted:
        # excerpt is the b side: all (or nearly all — the cut
        # boundary loses at most the last partial shingles) of its
        # shingles occur in the original
        assert r["cont_ba_fp"] >= 900000, r
    subset_only = [r for r in rows if r["subset_only"]]
    assert subset_only, "no subset-only pair found"
    for r in rows:
        assert r["inter"] <= min(r["n_a"], r["n_b"])
        assert r["jaccard_fp"] <= min(r["cont_ab_fp"], r["cont_ba_fp"])


def test_sft_template_pairing_and_fingerprint(spark, sf_smoke):
    """Each source yields floor(k/2) examples; rendered length is
    bounded by the truncation budget; the fingerprint matches a
    Python re-render of the probe pair."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.pipeline import q_sft_template

    rows = q_sft_template(spark, sf_smoke).collect()
    docs = load(spark, sf_smoke, "documents").select("source", "doc_id", "text").collect()
    per_src: dict = {}
    for d in docs:
        per_src.setdefault(d["source"], []).append((d["doc_id"], d["text"]))
    assert len(rows) == sum(len(v) // 2 for v in per_src.values())
    for r in rows:
        assert r["n_chars"] <= len("<|user|>\n") + 400 + len("\n<|assistant|>\n") + 400
        assert len(r["fingerprint"]) == 32
    probe = rows[0]
    texts = {d["doc_id"]: d["text"] for d in docs}
    rendered = (
        "<|user|>\n"
        + texts[probe["example_id"]][:400]
        + "\n<|assistant|>\n"
        + texts[probe["response_id"]][:400]
    )
    assert probe["fingerprint"] == hashlib.md5(rendered.encode()).hexdigest()
    assert probe["n_chars"] == len(rendered)
