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


def test_bpe_train_merge_sequence(spark, sf_smoke):
    """Three rounds, counts non-increasing (a merge can only shrink
    existing pair counts, and new pairs are bounded by the count of
    the pair they absorbed), merged token = left || right, and the
    first round's winner matches a direct Python pair count over the
    top-256 vocabulary."""
    import re
    from collections import Counter

    from metoffice_spark.io import load
    from metoffice_spark.operators.curation import _BPE_VOCAB, q_bpe_train

    rows = sorted(q_bpe_train(spark, sf_smoke).collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3]
    assert rows[0]["pair_count"] >= rows[1]["pair_count"] >= rows[2]["pair_count"]
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]

    texts = [
        r["text"]
        for r in load(spark, sf_smoke, "documents").select("text").collect()
    ]
    freqs = Counter()
    for t in texts:
        freqs.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    vocab = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_VOCAB]
    pair_counts = Counter()
    for w, f in vocab:
        for i in range(len(w) - 1):
            pair_counts[(w[i], w[i + 1])] += f
    best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (rows[0]["left"], rows[0]["right"]) == best[0]
    assert rows[0]["pair_count"] == best[1]


def test_sketch_quantile_error_bound(spark, sf_smoke):
    """The histogram estimate's error is structurally bounded by one
    bin width, and the estimate is the bin's lower edge (est <=
    exact)."""
    from metoffice_spark.operators.sketches import _QSK_BIN, q_sketch_quantile

    rows = q_sketch_quantile(spark, sf_smoke).collect()
    assert rows
    assert {r["pct"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert 0 <= r["err_cents"] < _QSK_BIN, r
        assert r["est"] <= r["exact"] < r["est"] + _QSK_BIN / 100.0


def test_k_anonymity_accounting(spark, sf_smoke):
    """Per-segment rows sum to the customer count; suppressed rows
    are bounded by (k-1) x classes_below_k; the rate is the exact
    quotient."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.quality import _K_ANON, q_k_anonymity

    rows = q_k_anonymity(spark, sf_smoke).collect()
    n_cust = load(spark, sf_smoke, "customer").count()
    assert sum(r["n_rows"] for r in rows) == n_cust
    for r in rows:
        assert r["suppressed_rows"] <= (_K_ANON - 1) * r["classes_below_k"]
        assert r["suppression_rate"] == r["suppressed_rows"] / r["n_rows"]
        assert r["k_actual"] >= 1


def test_ts_trend_matches_numpy(spark, sf_smoke):
    """Slope/intercept/R^2 agree with numpy's closed-form OLS on the
    same centered integer series (to IEEE round-off)."""
    import numpy as np

    from metoffice_spark.io import load
    from metoffice_spark.operators.behavior import q_ts_trend
    from pyspark.sql import functions as F

    rows = {r["event_type"]: r for r in q_ts_trend(spark, sf_smoke).collect()}
    daily = (
        load(spark, sf_smoke, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
                "cents"
            )
        )
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(
            (r["day"].toordinal(), r["cents"] // 100)
        )
    for t, pts in series.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        xs -= xs.min()
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, icept = np.polyfit(xs, ys, 1)
        got = rows[t]
        assert abs(got["slope"] - slope) < 1e-6 * max(abs(slope), 1)
        assert abs(got["intercept"] - icept) < 1e-6 * max(abs(icept), 1)
        pred = slope * xs + icept
        ss_res = ((ys - pred) ** 2).sum()
        ss_tot = ((ys - ys.mean()) ** 2).sum()
        assert abs(got["r2"] - (1 - ss_res / ss_tot)) < 1e-6
        assert 0.0 <= got["r2"] <= 1.0


def test_eval_calibration_accounting(spark, sf_smoke):
    """Bin populations cover the corpus exactly once; bins are in
    0..9; the gap is the absolute difference of the two rates."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.evaluation import q_eval_calibration

    rows = q_eval_calibration(spark, sf_smoke).collect()
    n_docs = load(spark, sf_smoke, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert r["gap_fp"] == abs(r["mean_pred_fp"] - r["obs_rate_fp"])
        assert 0 <= r["obs_rate_fp"] <= 1000000


def test_udf_grouped_map_normalization(spark, sf_smoke):
    """applyInPandas output covers every event exactly once; per-type
    min maps to 0 and max to 1000000; norm is monotone in v."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.udf import q_udf_grouped_map

    rows = q_udf_grouped_map(spark, sf_smoke).collect()
    assert len(rows) == load(spark, sf_smoke, "events").count()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["v_fp"], r["norm_fp"]))
    for t, vs in by_type.items():
        vs.sort()
        assert vs[0][1] == 0
        assert vs[-1][1] == 1000000 or vs[0][0] == vs[-1][0]
        assert all(a[1] <= b[1] for a, b in zip(vs, vs[1:]))


def test_coordinated_sampling_preserves_joins(spark, sf_smoke):
    """Coordinated orphans are structurally zero everywhere; the
    independent control orphans a substantial share of its sample
    (that contrast is the operator's whole point); sample rates land
    near 25%."""
    from metoffice_spark.operators.scale import q_sample_coordinated

    rows = q_sample_coordinated(spark, sf_smoke).collect()
    assert rows
    tot = lambda c: sum(r[c] for r in rows)  # noqa: E731
    assert all(r["orphans_coord"] == 0 for r in rows)
    assert tot("orphans_indep") > 0
    # ~75% of the independent sample should be orphaned (1 - p)
    assert tot("orphans_indep") > tot("n_orders_indep") // 2
    assert 0.10 < tot("n_cust_s") / tot("n_cust") < 0.45
    assert 0.10 < tot("n_orders_coord") / tot("n_orders") < 0.45
