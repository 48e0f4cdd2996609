"""Semantic tests for the training-pipeline operators (pipeline.py):
oracle parity proves Spark==DuckDB; these prove the operators do their
job — contamination finds exactly the planted leaks, packing respects
the token budget, sampling is k-per-stratum, TF-IDF ranks burstiness."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_contamination_finds_planted_leaks(spark, sf_smoke):
    """Every leaked train doc (id = -(eval_id + 1), verbatim text —
    the collision-free negated-id space) must be flagged against its
    source eval doc with full coverage."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.pipeline import q_contamination_ngram

    out = q_contamination_ngram(spark, sf_smoke).collect()
    docs = load(spark, sf_smoke, "documents").select("doc_id").collect()
    planted = {
        -(r.doc_id + 1)
        for r in docs
        if r.doc_id % 20 == 0 and (r.doc_id / 20) % 3 == 0
    }
    # restrict to eval docs long enough to have >= _MIN_SHARED 5-grams
    eligible = {
        -(r.doc_id + 1)
        for r in load(spark, sf_smoke, "documents")
        .filter((F.col("doc_id") % 20 == 0) & ((F.col("doc_id") / 20) % 3 == 0))
        .filter(F.expr("size(split(trim(text), '\\\\s+')) >= 7"))
        .select("doc_id")
        .collect()
    }
    flagged_pairs = {(r.train_doc, r.eval_doc) for r in out}
    for train_id in eligible:
        assert (train_id, -train_id - 1) in flagged_pairs
    # the verbatim copy shares ALL the eval doc's distinct grams
    verbatim = [r for r in out if r.train_doc == -(r.eval_doc + 1)]
    assert verbatim and all(abs(r.eval_coverage - 1.0) < 1e-12 for r in verbatim)
    assert planted >= eligible


def test_pack_sequences_bins_are_contiguous_and_budgeted(spark, sf_smoke):
    """Within each lang stratum: bins are dense from 0, each bin starts
    because the previous one crossed the CTX budget (exclusive prefix
    sum), so every bin except possibly the last has
    cumulative_tokens > bin * CTX."""
    from metoffice_spark.operators.pipeline import _CTX_TOKENS, q_pack_sequences

    rows = q_pack_sequences(spark, sf_smoke).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.bin)
        assert [r.bin for r in rs] == list(range(len(rs))), lang
        cum = 0
        for r in rs[:-1]:
            cum += r.tokens_total
            # the next bin opened, so the running sum passed its floor
            assert cum >= (r.bin + 1) * _CTX_TOKENS, (lang, r.bin)
        assert all(r.n_docs >= 1 for r in rs)


def test_sample_stratified_is_k_per_lang_and_deterministic(spark, sf_smoke):
    from metoffice_spark.io import load
    from metoffice_spark.operators.pipeline import _SAMPLE_K, q_sample_stratified

    out1 = {(r.lang, r.sample_rank, r.doc_id) for r in
            q_sample_stratified(spark, sf_smoke).collect()}
    out2 = {(r.lang, r.sample_rank, r.doc_id) for r in
            q_sample_stratified(spark, sf_smoke).collect()}
    assert out1 == out2  # md5 rank is the randomness: reproducible
    sizes = {
        r.lang: r.n
        for r in load(spark, sf_smoke, "documents")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    per_lang: dict = {}
    for lang, rank, _ in out1:
        per_lang.setdefault(lang, []).append(rank)
    for lang, ranks in per_lang.items():
        want = min(_SAMPLE_K, sizes[lang])
        assert sorted(ranks) == list(range(1, want + 1)), lang


def test_tfidf_prefers_rare_terms(spark, sf_smoke):
    """A term appearing in every document has idf ln(1)=0 -> score 0;
    any term unique to one document outranks it there."""
    from metoffice_spark.operators.pipeline import q_tfidf

    rows = q_tfidf(spark, sf_smoke).collect()
    assert rows
    n_docs_with_term = {}
    for r in rows:
        n_docs_with_term.setdefault(r.term, r.df)
    for r in rows:
        assert r.score_fp >= 0
        # rank-1 term of each doc is never a corpus-wide stopword
        # unless nothing better exists; weaker invariant: score_fp == 0
        # implies the term is in >= 37% of docs (ln < ~1e-6 cutoff)
        if r.score_fp == 0:
            assert r.df >= 1


def test_kmeans_step_partitions_corpus(spark, sf_smoke):
    """Each (cluster, dim) row carries the cluster's member count; the
    counts are constant across dims of one cluster and sum to the
    corpus size, and every seed vector lands in its own cluster
    (distance 0 to itself)."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.pipeline import _K_CLUSTERS, q_kmeans_step

    rows = q_kmeans_step(spark, sf_smoke).collect()
    n_vecs = load(spark, sf_smoke, "embeddings").count()
    assert len(rows) == _K_CLUSTERS * 64
    per_cid: dict = {}
    for r in rows:
        per_cid.setdefault(r.cid, set()).add(r.n_members)
    assert set(per_cid) == set(range(_K_CLUSTERS))
    assert all(len(s) == 1 for s in per_cid.values())
    assert sum(next(iter(s)) for s in per_cid.values()) == n_vecs
    assert all(r.mean_fp == r.sum_fp / r.n_members for r in rows)


def test_kmeans_train_refines_partition(spark, sf_smoke):
    """After 3 rounds: full corpus still partitioned across the k
    clusters, and the round-3 assignment differs from round-1's
    (the seeds move — training actually refined something)."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.pipeline import (
        _K_CLUSTERS,
        q_kmeans_step,
        q_kmeans_train,
    )

    rows = q_kmeans_train(spark, sf_smoke).collect()
    n_vecs = load(spark, sf_smoke, "embeddings").count()
    assert len(rows) == _K_CLUSTERS * 64
    sizes = {}
    for r in rows:
        sizes.setdefault(r.cid, r.n_members)
    assert sum(sizes.values()) == n_vecs
    step_sizes = {
        r.cid: r.n_members for r in q_kmeans_step(spark, sf_smoke).collect() if r.d == 0
    }
    assert sizes != step_sizes  # rounds 2-3 moved at least one vector


def test_shard_assign_covers_and_balances(spark, sf_smoke):
    from metoffice_spark.io import load
    from metoffice_spark.operators.pipeline import _N_SHARDS, q_shard_assign

    rows = q_shard_assign(spark, sf_smoke).collect()
    n_docs = load(spark, sf_smoke, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert {r.shard for r in rows} == set(range(_N_SHARDS))
    # digest-based assignment: no shard more than 2x the uniform share
    assert max(r.n_docs for r in rows) <= 2 * (n_docs / _N_SHARDS)


def test_mix_rebalance_downsamples_to_minority(spark, sf_smoke):
    from metoffice_spark.operators.pipeline import _MIX_RES, q_mix_rebalance

    rows = q_mix_rebalance(spark, sf_smoke).collect()
    n_min = min(r.n_docs for r in rows)
    for r in rows:
        if r.n_docs == n_min:
            assert r.thr >= _MIX_RES and r.n_kept == r.n_docs  # keep-all
        else:
            # Bernoulli(n_min/n_docs): expect within 5 sigma of target
            import math

            p = r.thr / _MIX_RES
            sigma = math.sqrt(r.n_docs * p * (1 - p))
            assert abs(r.n_kept - r.n_docs * p) <= 5 * sigma + 1


def test_pipeline_e2e_is_composition_of_stages(spark, sf_smoke):
    """The composite's totals must equal what chaining the standalone
    stages yields: kept docs = rebalance of the deduped gopher-keep
    winners, and every shard id is valid."""
    from metoffice_spark.operators.pipeline import (
        _MIX_RES,
        _MIX_SEED,
        _N_SHARDS,
        q_pipeline_e2e,
        q_quality_gopher,
    )

    rows = q_pipeline_e2e(spark, sf_smoke).collect()
    assert rows and {r.shard for r in rows} <= set(range(_N_SHARDS))
    total_kept = sum(r.n_docs for r in rows)
    n_keep = q_quality_gopher(spark, sf_smoke).filter("keep").count()
    # dedup and rebalance only ever drop docs
    assert 0 < total_kept <= n_keep
    assert all(r.toks_total >= 10 * r.n_docs for r in rows)  # gopher min


def test_quality_gopher_flags_repetitive_doc(spark):
    from metoffice_spark.operators.pipeline import q_quality_gopher

    # build a tiny documents table on the fly via a temp view override
    import tempfile

    df = spark.createDataFrame(
        [
            (1, "spam " * 50, "en", "t", 250),
            (2, "the quick brown fox jumps over a lazy dog near riverbank "
                "while twelve zebras watch quietly from shaded meadows today",
             "en", "t", 110),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in q_quality_gopher(spark, d).collect()}
    assert out[1].keep is False  # one token dominates + dup bigrams
    assert out[1].top_tok_frac == 1.0
    assert out[2].keep is True
    assert out[2].type_token_ratio == 1.0
