"""Semantic property tests for the round-5e stats wave: AUC, chi²
terms, Gini, ridge normal equations, neighborhood Jaccard, survival
hazard, dictionary-encoding estimates, JSONL export. Bitwise oracle
parity is covered by tests/test_oracle_parity.py; these check the
properties the oracles cannot express."""

from __future__ import annotations

import json
import math


def test_eval_auc_matches_pairwise_recount(spark, sf_smoke):
    """AUC bounded in [0, 1e6]; for one source the fixed-point value
    matches a direct O(n_pos * n_neg) concordance recount."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_eval_auc

    rows = {r["source"]: r for r in q_eval_auc(spark, sf_smoke).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r["auc_fp"] <= 1_000_000
        assert 0 < r["n_pos"] < r["n"]
    probe = sorted(rows)[0]
    docs = (
        load(spark, sf_smoke, "documents")
        .filter(f"source = '{probe}'")
        .select("n_chars", "lang")
        .collect()
    )
    pos = [r["n_chars"] for r in docs if r["lang"] == "en"]
    neg = [r["n_chars"] for r in docs if r["lang"] != "en"]
    conc = sum(2 for p in pos for q in neg if p > q) + sum(
        1 for p in pos for q in neg if p == q
    )
    expected = 1_000_000 * conc // (2 * len(pos) * len(neg))
    assert rows[probe]["auc_fp"] == expected


def test_chi2_terms_cells_consistent(spark, sf_smoke):
    """The 2×2 cells of every reported term sum to the corpus total,
    chi² is non-negative, and the statistic matches a recompute from
    the reported cells."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import _CHI2_TOPK, q_chi2_terms

    rows = q_chi2_terms(spark, sf_smoke).collect()
    assert 0 < len(rows) <= _CHI2_TOPK
    n_docs = load(spark, sf_smoke, "documents").count()
    for r in rows:
        a, b, c, d = r["a"], r["b"], r["c"], r["d"]
        assert a + b + c + d == n_docs
        assert min(a, b, c, d) >= 0
        n = a + b + c + d
        expected = (
            n * float((a * d - b * c)) ** 2
            / ((a + b) * (c + d) * (a + c) * (b + d))
        )
        assert r["chi2"] >= 0.0
        assert math.isclose(r["chi2"], expected, rel_tol=1e-12)


def test_gini_spend_bounds_and_recount(spark, sf_smoke):
    """Gini sits in [0, 1); one segment matches the textbook
    pairwise-difference formula recomputed in Python."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_gini_spend

    rows = {r["seg"]: r for r in q_gini_spend(spark, sf_smoke).collect()}
    assert rows
    for r in rows.values():
        assert 0.0 <= r["gini"] < 1.0
    probe = sorted(rows)[0]
    orders = load(spark, sf_smoke, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf_smoke, "customer").select("c_custkey", "c_mktsegment")
    spend: dict = {}
    seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in cust.collect()}
    for r in orders.collect():
        if seg_of.get(r["o_custkey"]) == probe:
            cents = math.floor(r["o_totalprice"] * 100 + 0.5)
            spend[r["o_custkey"]] = spend.get(r["o_custkey"], 0) + cents
    xs = sorted(spend.values())
    n, sx = len(xs), sum(xs)
    gini = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs)) / (n * sx)
    assert math.isclose(rows[probe]["gini"], gini, rel_tol=1e-9)
    assert rows[probe]["n"] == n
    assert rows[probe]["total_cents"] == sx


def test_ridge_normal_solves_system(spark, sf_smoke):
    """The returned coefficients satisfy the ridge normal equations
    (A + λI)w = b rebuilt from the returned Gram sums."""
    from metoffice_spark.operators.stats import _RIDGE_LAMBDA, q_ridge_normal

    r = q_ridge_normal(spark, sf_smoke).collect()[0]
    lam = float(_RIDGE_LAMBDA)
    A = [
        [float(r["n"]), float(r["sx1"]), float(r["sx2"])],
        [float(r["sx1"]), float(r["sx11"]) + lam, float(r["sx12"])],
        [float(r["sx2"]), float(r["sx12"]), float(r["sx22"]) + lam],
    ]
    b = [float(r["sy"]), float(r["sx1y"]), float(r["sx2y"])]
    w = [r["w0"], r["w1"], r["w2"]]
    for i in range(3):
        lhs = sum(A[i][j] * w[j] for j in range(3))
        assert math.isclose(lhs, b[i], rel_tol=1e-9)


def test_graph_jaccard_exact_for_probe_pair(spark, sf_smoke):
    """Reported intersections are exact: a probe pair's intersection
    and union match a Python set recount over the full edge set."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_graph_jaccard

    rows = q_graph_jaccard(spark, sf_smoke).collect()
    assert rows
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load(spark, sf_smoke, "orders").collect()
    }
    adj: dict = {}
    for r in load(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_suppkey"
    ).collect():
        c = orders.get(r["l_orderkey"])
        if c is not None:
            adj.setdefault(c, set()).add(r["l_suppkey"])
    for r in rows[:5]:
        sa, sb = adj[r["ca"]], adj[r["cb"]]
        assert r["inter"] == len(sa & sb)
        assert r["uni"] == len(sa | sb)
        assert r["jaccard_fp"] == 1_000_000 * r["inter"] // r["uni"]


def test_survival_hazard_at_risk_telescopes(spark, sf_smoke):
    """at_risk is the reverse cumulative total, the day-0 at_risk
    equals the user count, and hazards are valid probabilities."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_survival_hazard

    rows = sorted(
        q_survival_hazard(spark, sf_smoke).collect(), key=lambda r: r["d"]
    )
    assert rows
    n_users = (
        load(spark, sf_smoke, "events").select("user_id").distinct().count()
    )
    assert rows[0]["at_risk"] == n_users
    total = sum(r["events"] + r["censored"] for r in rows)
    assert total == n_users
    tail = total
    for r in rows:
        assert r["at_risk"] == tail
        tail -= r["events"] + r["censored"]
        assert 0 <= r["hazard_fp"] <= 1_000_000


def test_compress_dict_bit_width_exact(spark, sf_smoke):
    """bit_width is exactly ceil(log2(max(n_distinct, 2))) and the
    low-cardinality enum columns compress far below the key column."""
    from metoffice_spark.operators.stats import q_compress_dict

    rows = {r["col"]: r for r in q_compress_dict(spark, sf_smoke).collect()}
    assert set(rows) == {"o_orderstatus", "o_orderpriority", "o_custkey"}
    for r in rows.values():
        expected = max(1, math.ceil(math.log2(max(r["n_distinct"], 2))))
        assert r["bit_width"] == expected
        assert r["dict_bits"] == r["n"] * r["bit_width"]
        assert r["plain_bits"] == r["plain_bytes"] * 8
    assert rows["o_orderstatus"]["ratio_fp"] < rows["o_custkey"]["ratio_fp"]


def test_sink_jsonl_lines_parse(spark, sf_smoke):
    """Every line is valid JSON whose fields round-trip the source
    row, and line_bytes is the UTF-8 length."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_sink_jsonl

    rows = q_sink_jsonl(spark, sf_smoke).collect()
    docs = {
        r["doc_id"]: r
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows[:50]:
        obj = json.loads(r["line"])
        d = docs[r["doc_id"]]
        assert obj == {
            "doc_id": d["doc_id"],
            "lang": d["lang"],
            "source": d["source"],
            "n_chars": d["n_chars"],
        }
        assert r["line_bytes"] == len(r["line"].encode("utf-8"))


def test_forecast_snaive_recount_probe(spark, sf_smoke):
    """One (event_type, hour) cell's forecast and the final MAE match
    a direct Python recount of the seasonal profile."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_forecast_snaive

    rows = {r["event_type"]: r for r in q_forecast_snaive(spark, sf_smoke).collect()}
    assert rows
    ev = load(spark, sf_smoke, "events").select("event_type", "ts", "value").collect()
    dmax = max(r["ts"].date() for r in ev)
    train: dict = {}
    hold: dict = {}
    for r in ev:
        cents = math.floor(r["value"] * 100 + 0.5)
        key = (r["event_type"], r["ts"].hour)
        tgt = hold if r["ts"].date() == dmax else train
        s, c = tgt.get(key, (0, 0))
        tgt[key] = (s + cents, c + 1)
    per_type: dict = {}
    for key, (s, c) in hold.items():
        if key not in train:
            continue
        ts_, tc = train[key]
        err = abs(1_000_000 * s // c - 1_000_000 * ts_ // tc)
        n, tot = per_type.get(key[0], (0, 0))
        per_type[key[0]] = (n + 1, tot + err)
    for t, (n, tot) in per_type.items():
        assert rows[t]["n_hours"] == n
        assert rows[t]["mae_fp"] == tot // n


def test_target_encoding_no_leakage(spark, sf_smoke):
    """Encoding excludes the row's own target: for a probe row the
    fixed-point value matches the leave-one-out formula, and two rows
    of the same category with different targets get different
    encodings."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import _TE_SMOOTH, q_target_encoding

    rows = q_target_encoding(spark, sf_smoke).collect()
    assert rows
    ev = load(spark, sf_smoke, "events").select(
        "event_type", "value"
    ).collect()
    sums: dict = {}
    for r in ev:
        cents = math.floor(r["value"] * 100 + 0.5)
        s, c = sums.get(r["event_type"], (0, 0))
        sums[r["event_type"]] = (s + cents, c + 1)
    tot = sum(s for s, _ in sums.values())
    cnt = sum(c for _, c in sums.values())
    prior_fp = 1_000_000 * tot // cnt
    for r in rows[:20]:
        s, c = sums[r["event_type"]]
        expected = (1_000_000 * (s - r["y"]) + _TE_SMOOTH * prior_fp) // (
            c - 1 + _TE_SMOOTH
        )
        assert r["enc_fp"] == expected


def test_drift_chi2_margins(spark, sf_smoke):
    """Shares per window sum to ~1, counts partition the stream, and
    chi2 is non-negative and finite."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_drift_chi2

    rows = q_drift_chi2(spark, sf_smoke).collect()
    assert rows
    n_events = load(spark, sf_smoke, "events").count()
    assert sum(r["n_base"] + r["n_cur"] for r in rows) == n_events
    s1 = sum(r["share_base_fp"] for r in rows)
    s2 = sum(r["share_cur_fp"] for r in rows)
    assert abs(s1 - 1_000_000) <= len(rows)
    assert abs(s2 - 1_000_000) <= len(rows)
    for r in rows:
        assert r["chi2"] >= 0.0 and math.isfinite(r["chi2"])


def test_eval_multiclass_consistent_with_confusion(spark, sf_smoke):
    """Marginals rebuild from the nb_langid confusion matrix; kappa
    matches the textbook formula and never exceeds accuracy."""
    from metoffice_spark.operators.classify import q_nb_langid
    from metoffice_spark.operators.stats import q_eval_multiclass

    conf = q_nb_langid(spark, sf_smoke).collect()
    rows = {r["cls"]: r for r in q_eval_multiclass(spark, sf_smoke).collect()}
    n = sum(r["n_docs"] for r in conf)
    correct = sum(r["n_docs"] for r in conf if r["actual_lang"] == r["pred_lang"])
    support: dict = {}
    pred_n: dict = {}
    for r in conf:
        support[r["actual_lang"]] = support.get(r["actual_lang"], 0) + r["n_docs"]
        pred_n[r["pred_lang"]] = pred_n.get(r["pred_lang"], 0) + r["n_docs"]
    classes = set(support) | set(pred_n)
    assert set(rows) == classes
    pe_num = sum(support.get(c, 0) * pred_n.get(c, 0) for c in classes)
    kappa = (n * correct - pe_num) / (n * n - pe_num)
    for r in rows.values():
        assert r["support"] == support.get(r["cls"], 0)
        assert r["pred_n"] == pred_n.get(r["cls"], 0)
        assert r["accuracy_fp"] == 1_000_000 * correct // n
        assert math.isclose(r["kappa"], kappa, rel_tol=1e-12)
        assert r["kappa"] <= correct / n + 1e-12


def test_text_readability_recount(spark, sf_smoke):
    """A probe document's word/sentence/syllable counts match a
    Python recount, and the Flesch value follows from them."""
    import re

    from metoffice_spark.io import load
    from metoffice_spark.operators.stats import q_text_readability

    rows = q_text_readability(spark, sf_smoke).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_smoke, "documents").collect()
    }
    assert len(rows) <= len(texts)
    for r in sorted(rows, key=lambda x: x["doc_id"])[:10]:
        t = texts[r["doc_id"]]
        words = len([w for w in re.split(r"[^a-z0-9]+", t.lower()) if w])
        sents = max(1, len([s for s in re.split(r"[.!?]+", t) if s.strip()]))
        syll = len([v for v in re.split(r"[^aeiouy]+", t.lower()) if v])
        assert r["words"] == words
        assert r["sentences"] == sents
        assert r["syllables"] == syll
        expected = 206.835 - 1.015 * (words / sents) - 84.6 * (syll / words)
        assert math.isclose(r["flesch"], expected, rel_tol=1e-12)


def test_fp_div_1e6_exact_at_large_magnitudes():
    """The two-stage divide equals the mathematically exact
    (num * 1e6) // den for magnitudes where the naive single multiply
    would overflow int64 — checked through DuckDB (no Spark needed;
    the Spark text differs only in div vs //)."""
    import duckdb

    from metoffice_spark.operators.stats import _fp_div_1e6

    con = duckdb.connect()
    cases = [
        (0, 7),
        (1, 3),
        (123456789, 987654321),
        # beyond the naive bound: num * 1e6 > int64 max
        (9_223_372_036_854, 9_223_372_036_855),
        (4_611_686_018_427_387, 9_223_372_036_854_775),  # num*1000 near max
        (7_000_000_000_000_000, 9_000_000_000_000_000),
    ]
    for num, den in cases:
        # BIGINT casts mirror the real call sites (BIGINT columns)
        expr = _fp_div_1e6(
            f"CAST({num} AS BIGINT)", f"CAST({den} AS BIGINT)", "//"
        )
        got = con.sql(f"SELECT CAST({expr} AS BIGINT)").fetchone()[0]
        assert got == (num * 1_000_000) // den, (num, den)


def test_chi2_2x2_no_int64_overflow_at_billion_scale():
    """The shared chi² text must survive cell counts whose raw cross
    products exceed int64 (every factor casts to double first)."""
    import duckdb

    from metoffice_spark.operators.stats import _chi2_2x2

    con = duckdb.connect()
    a, b, c, d = 1_500_000_000, 2_000_000_000, 1_000_000_000, 6_500_000_000
    got = con.sql(
        f"SELECT {_chi2_2x2()} FROM (SELECT CAST({a} AS BIGINT) a,"
        f" CAST({b} AS BIGINT) b, CAST({c} AS BIGINT) c,"
        f" CAST({d} AS BIGINT) d)"
    ).fetchone()[0]
    n = a + b + c + d
    expected = (
        n * (float(a) * d - float(b) * c) ** 2
        / (float(a + b) * (c + d) * (a + c) * (b + d))
    )
    import math

    assert math.isfinite(got) and got >= 0
    assert math.isclose(got, expected, rel_tol=1e-9)
