"""Semantic property tests for the round-5i curation wave: quality
ensemble, hard negatives, span corruption."""

from __future__ import annotations

import re


def test_quality_ensemble_composes_components(spark, sf_smoke):
    """The verdict is exactly the AND of the three component flags,
    and each flag matches its source operator's output."""
    from metoffice_spark.operators.classify import q_quality_classifier
    from metoffice_spark.operators.curation2 import (
        _ENS_FLESCH_MIN,
        q_quality_ensemble,
    )
    from metoffice_spark.operators.pipeline import q_quality_gopher
    from metoffice_spark.operators.stats import q_text_readability

    g = {r["doc_id"]: r["keep"] for r in q_quality_gopher(spark, sf_smoke).collect()}
    c = {
        r["doc_id"]: r["keep"]
        for r in q_quality_classifier(spark, sf_smoke).collect()
    }
    fl = {
        r["doc_id"]: r["flesch"]
        for r in q_text_readability(spark, sf_smoke).collect()
    }
    rows = q_quality_ensemble(spark, sf_smoke).collect()
    assert {r["doc_id"] for r in rows} == set(g)
    reasons = set()
    for r in rows:
        d = r["doc_id"]
        assert r["gopher_keep"] == g[d]
        assert r["clf_keep"] == c.get(d, False)
        assert r["read_keep"] == (fl.get(d, -1e9) >= _ENS_FLESCH_MIN)
        assert r["keep"] == (r["gopher_keep"] and r["clf_keep"] and r["read_keep"])
        if not r["gopher_keep"]:
            assert r["reason"] == "gopher"
        elif not r["clf_keep"]:
            assert r["reason"] == "classifier"
        elif not r["read_keep"]:
            assert r["reason"] == "readability"
        else:
            assert r["reason"] == "ok"
        reasons.add(r["reason"])
    assert "ok" in reasons


def test_hard_negatives_are_cross_label_and_hardest(spark, sf_smoke):
    """Every negative has a different label from its anchor, ranks
    descend by cosine, and for a probe anchor the top negative beats
    every other cross-label vector (recount)."""
    import math

    from metoffice_spark.io import load
    from metoffice_spark.operators.curation2 import _HN_K, q_hard_negatives

    rows = q_hard_negatives(spark, sf_smoke).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r["neg_label"] != r["q_label"]
        by_q.setdefault(r["q_id"], []).append(r)
    emb = {
        r["vec_id"]: (r["label"], [math.floor(x * 1e6 + 0.5) for x in r["embedding"]])
        for r in load(spark, sf_smoke, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    probe = sorted(by_q)[0]
    got = sorted(by_q[probe], key=lambda r: r["rnk"])
    assert len(got) == min(
        _HN_K, sum(1 for v in emb.values() if v[0] != emb[probe][0])
    )
    cosines = [r["cos"] for r in got]
    assert cosines == sorted(cosines, reverse=True)
    qlabel, qv = emb[probe]
    best = max(
        (v for k, v in emb.items() if v[0] != qlabel),
        key=lambda v: cos(qv, v[1]),
    )
    assert math.isclose(got[0]["cos"], cos(qv, best[1]), rel_tol=1e-12)


def test_span_corruption_roundtrip(spark, sf_smoke):
    """Sentinels pair up between input and target; merging input
    (with each sentinel replaced by its target span) reconstructs the
    original token stream exactly."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.curation2 import q_span_corruption

    rows = q_span_corruption(spark, sf_smoke).collect()
    assert rows
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_smoke, "documents").collect()
    }
    checked_mask = 0
    for r in rows[:25]:
        toks = [t for t in re.split(r"[^a-z0-9]+", texts[r["doc_id"]].lower()) if t]
        assert r["n_tokens"] == len(toks)
        # parse target into {sentinel: [tokens]}
        spans: dict = {}
        cur = None
        for t in r["target_text"].split(" ") if r["target_text"] else []:
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt: list = []
        n_from_spans = 0
        for t in r["input_text"].split(" ") if r["input_text"] else []:
            if t.startswith("<extra_id_"):
                rebuilt.extend(spans[t])
                n_from_spans += len(spans[t])
            else:
                rebuilt.append(t)
        assert rebuilt == toks
        assert n_from_spans == r["n_masked"]
        checked_mask += r["n_masked"]
    assert checked_mask > 0
