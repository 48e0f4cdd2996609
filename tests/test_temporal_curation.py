"""Semantic tests for the round-4 temporal + curation operators:
SCD2 versions must tile each key's timeline, the point-in-time join
must agree with the naive interval join, the sweep-line max must
match a brute-force recount, systematic sampling must hand out
exactly N picks, and the EWMA must degenerate correctly at series
start."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_scd2_versions_tile_timeline(spark, sf_smoke):
    from metoffice_spark.io import load
    from metoffice_spark.operators.temporal import q_scd2_build

    scd2 = q_scd2_build(spark, sf_smoke).cache()
    try:
        # exactly one open (is_current) version per user
        per_user = scd2.groupBy("user_id").agg(
            F.sum("is_current").alias("n_open"),
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_versions"),
        )
        assert per_user.filter(F.col("n_open") != 1).count() == 0
        # version event counts add up to the raw event count
        ev = (
            load(spark, sf_smoke, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_raw"))
        )
        mismatch = per_user.join(ev, "user_id").filter(
            F.col("n_events") != F.col("n_raw")
        )
        assert mismatch.count() == 0
        # valid_to of version k == valid_from of version k+1 (no gaps)
        a = scd2.select("user_id", "version", "valid_to").filter(
            F.col("valid_to").isNotNull()
        )
        b = scd2.select(
            "user_id",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
        )
        joined = a.join(b, ["user_id", "version"])
        assert joined.filter(F.col("valid_to") != F.col("next_from")).count() == 0
        assert joined.count() == a.count()
    finally:
        scd2.unpersist()


def test_pit_join_equals_interval_join(spark, sf_smoke):
    """The union-window PIT result must equal the naive BETWEEN join
    computed in Spark itself (the oracle re-proves this vs DuckDB)."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.temporal import _scd2, q_join_temporal

    got = {
        (r["user_id"], str(r["day"])): (r["event_type"], r["version"])
        for r in q_join_temporal(spark, sf_smoke).collect()
    }
    dim = _scd2(spark, sf_smoke)
    probes = (
        load(spark, sf_smoke, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .withColumn("pts", F.col("day").cast("timestamp"))
    )
    naive = probes.alias("p").join(
        dim.alias("d"),
        (F.col("p.user_id") == F.col("d.user_id"))
        & (F.col("d.valid_from") <= F.col("p.pts"))
        & (F.col("d.valid_to").isNull() | (F.col("d.valid_to") > F.col("p.pts"))),
    )
    want = {
        (r["user_id"], str(r["day"])): (r["event_type"], r["version"])
        for r in naive.select("p.user_id", "p.day", "d.event_type", "d.version").collect()
    }
    assert got == want


def test_interval_sweep_matches_bruteforce(spark, sf_smoke):
    from metoffice_spark.io import load
    from metoffice_spark.operators.temporal import _OPEN_DAYS, q_interval_sweep

    got = {
        r["o_custkey"]: (r["n_orders"], r["max_open"])
        for r in q_interval_sweep(spark, sf_smoke).collect()
    }
    rows = (
        load(spark, sf_smoke, "orders")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    import collections
    import datetime

    per_cust = collections.defaultdict(list)
    for r in rows:
        per_cust[r["o_custkey"]].append(r["o_orderdate"])
    for ck, dates in per_cust.items():
        # brute force: concurrency at each open instant (max occurs there)
        best = 0
        for t in dates:
            n = sum(
                1
                for s in dates
                if s <= t < s + datetime.timedelta(days=_OPEN_DAYS)
            )
            best = max(best, n)
        assert got[ck] == (len(dates), best), f"custkey {ck}"


def test_ewma_series_start_and_kernel(spark, sf_smoke):
    from metoffice_spark.operators.temporal import _EWMA_K, q_win_ewma

    df = q_win_ewma(spark, sf_smoke)
    w = (
        df.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("first"))
        .join(df, F.struct("ts", "event_id") == F.col("first"))
    )
    # at series start the kernel has one term: ewma == x_fp exactly
    bad = w.filter(F.col("ewma_num") != F.col("x_fp") * (1 << (_EWMA_K - 1)))
    assert bad.count() == 0
    assert df.filter(F.col("ewma_den") <= 0).count() == 0
    # den is at most the full kernel mass
    assert df.filter(F.col("ewma_den") > (1 << _EWMA_K) - 1).count() == 0


def test_sample_weighted_hands_out_exactly_n_picks(spark, sf_smoke):
    from metoffice_spark.operators.curation import _WS_N, q_sample_weighted

    picks = q_sample_weighted(spark, sf_smoke).agg(F.sum("n_picks")).collect()[0][0]
    assert picks == _WS_N


def test_boilerplate_fraction_bounds(spark, sf_smoke):
    from metoffice_spark.operators.curation import q_text_boilerplate

    rows = q_text_boilerplate(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bp_instances"] <= r["phrase_instances"]


def test_bpe_pairs_are_char_pairs(spark, sf_smoke):
    from metoffice_spark.operators.curation import _BPE_TOP, q_bpe_pair_count

    rows = q_bpe_pair_count(spark, sf_smoke).collect()
    assert 0 < len(rows) <= _BPE_TOP
    assert [r["rnk"] for r in sorted(rows, key=lambda r: r["rnk"])] == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert len(r["pair"]) == 2 and r["n"] > 0


def test_embed_dimstats_covers_all_dims(spark, sf_smoke):
    from metoffice_spark.io import load
    from metoffice_spark.operators.curation import q_embed_dimstats

    rows = q_embed_dimstats(spark, sf_smoke).collect()
    n_vecs = load(spark, sf_smoke, "embeddings").count()
    assert len(rows) == 64
    for r in rows:
        assert r["n"] == n_vecs
        assert r["min_fp"] <= r["max_fp"]


def test_pq_adc_ranks_and_exact_audit(spark, sf_smoke):
    from metoffice_spark.operators.curation import (
        _PQ_QUERIES,
        _PQ_TOPK,
        q_ann_pq,
    )

    rows = q_ann_pq(spark, sf_smoke).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
        assert r["adc_fp"] >= 0 and r["exact_fp"] >= 0
        assert r["vec_id"] >= _PQ_QUERIES  # queries never match themselves
    assert set(per_q) == set(range(_PQ_QUERIES))
    for q_id, rs in per_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, _PQ_TOPK + 1))
        # ADC distances are monotone in rank by construction
        adcs = [r["adc_fp"] for r in rs]
        assert adcs == sorted(adcs)


def test_zorder_shrinks_both_key_spans(spark, sf_smoke):
    """The whole point of Z-order: the clustered layout must have a
    strictly smaller summed footer-stat span than arrival order on
    BOTH dimensions at once."""
    from metoffice_spark.operators.scale import q_layout_zorder

    rows = {r["layout"]: r for r in q_layout_zorder(spark, sf_smoke).collect()}
    assert set(rows) == {"arrival", "zorder"}
    assert rows["arrival"]["n_rows"] == rows["zorder"]["n_rows"]
    assert rows["zorder"]["pk_span_sum"] < rows["arrival"]["pk_span_sum"]
    assert rows["zorder"]["sk_span_sum"] < rows["arrival"]["sk_span_sum"]


def test_hll_estimate_within_tolerance(spark, sf_smoke):
    """256-register HLL has ~6.5% relative standard error; assert the
    estimate lands within 4 sigma of the exact count."""
    from metoffice_spark.operators.scale import q_sketch_hll

    r = q_sketch_hll(spark, sf_smoke).collect()[0]
    assert r["m"] == 256
    rel_err = abs(r["est_distinct"] - r["n_exact"]) / r["n_exact"]
    assert rel_err < 0.26, (r["est_distinct"], r["n_exact"])


def test_tokenize_ids_roundtrip(spark, sf_smoke):
    """The id sequence ('|'-joined string — the driver's pandas
    canonicalizer cannot hash top-level arrays) must preserve token
    order and length, and UNK ids must count exactly the out-of-vocab
    positions."""
    from metoffice_spark.operators.curation import q_tokenize_ids

    rows = q_tokenize_ids(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        ids = [int(s) for s in r["ids"].split("|")]
        assert len(ids) == r["n_tokens"]
        assert sum(1 for i in ids if i == 0) == r["n_unk"]
        assert all(i >= 0 for i in ids)


def test_bm25_scores_rank_consistently(spark, sf_smoke):
    from metoffice_spark.operators.curation import _BM25_TOPK, q_rank_bm25

    rows = sorted(q_rank_bm25(spark, sf_smoke).collect(), key=lambda r: r["rnk"])
    assert 0 < len(rows) <= _BM25_TOPK
    scores = [r["score_fp"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r["n_terms_hit"] <= 3 for r in rows)
    assert all(r["score_fp"] > 0 for r in rows)
