"""Degenerate-slice parity: every query fixed by the r07 empty/near-
empty fuzz findings must keep matching its DuckDB oracle when the fact
tables are EMPTY (keep 0‰) — the slice shape the stock gate and the
ordinary fuzz seeds never produce.

Why this matters at scale: an empty relation is not an exotic input at
100 TB — it is what any date/tenant/lang predicate yields on a
partition that doesn't contain the key. The r07 probe
(artifacts/FUZZPARITY_r07_empty_sf0.001_k0.log) found five failure
families on a fully-empty slice:

- grouping-set global rows: Spark plans CUBE/ROLLUP via Expand, which
  emits ZERO rows from zero input, where the SQL standard (and DuckDB)
  gives the () grouping set one global-aggregate row (q_agg_cube,
  q_dataset_fingerprint — both rewritten two-phase);
- ANSI DIVIDE_BY_ZERO where DuckDB's IEEE divide yields inf/NaN: every
  ratio denominator that a slice can zero now goes through nullif
  (q_funnel_steps, q_ab_ztest, q_cov_stats, q_jackknife_var);
- driver-side seed constants dividing by an empty count
  (q_graph_pagerank);
- schema inference over a fileless partitioned write
  (q_sink_partitioned);
- NULL replay-watermark constants typed as INTERVAL arithmetic
  (the five stream replays), and a sum-vs-count audit asymmetry
  (q_sketch_setops).

The near-empty slice (keep 1‰) exercises the one-surviving-group
variants of the same divisions. Both slices run the full registry per
round via tools/fuzz_parity.py; this test keeps the property alive in
every pytest run for the queries that actually regressed.
"""

from __future__ import annotations

import pytest

from metoffice_spark.oracle_check import compare, connect_oracle
from metoffice_spark.registry import _collect

from tools.fuzz_parity import materialize_slice

REG = _collect()

# the r07 probe's failure set; streaming replays are the expensive
# ones but run in seconds on an empty input
FIXED_QIDS = (
    "q_agg_cube",
    "q_dataset_fingerprint",
    "q_funnel_steps",
    "q_graph_pagerank",
    "q_sink_partitioned",
    "q_sketch_setops",
    "q_stream_anomaly",
    "q_stream_gap_detector",
    "q_stream_stateful",
    "q_stream_twap",
    "q_stream_watermark",
)

# divisions (and one audit-algebra asymmetry) that only degenerate
# when a single group/cohort/event-type survives the slice
NEAR_EMPTY_QIDS = (
    "q_ab_ztest",
    "q_cov_stats",
    "q_jackknife_var",
    "q_sketch_setops",
)


@pytest.fixture(scope="module")
def empty_dir(sf_smoke):
    return materialize_slice(sf_smoke, seed=1, keep_permille=0)


@pytest.fixture(scope="module")
def empty_oracle(empty_dir):
    con = connect_oracle(empty_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def nearempty_dir(sf_smoke):
    return materialize_slice(sf_smoke, seed=3, keep_permille=1)


@pytest.fixture(scope="module")
def nearempty_oracle(nearempty_dir):
    con = connect_oracle(nearempty_dir)
    yield con
    con.close()


@pytest.mark.parametrize("qid", FIXED_QIDS)
def test_empty_slice_parity(qid, spark, empty_oracle, empty_dir):
    fn, sql = REG[qid]
    assert sql is not None
    assert compare(spark, empty_oracle, fn, sql, empty_dir) == []


@pytest.mark.parametrize("qid", NEAR_EMPTY_QIDS + FIXED_QIDS[:3])
def test_nearempty_slice_parity(qid, spark, nearempty_oracle, nearempty_dir):
    fn, sql = REG[qid]
    assert sql is not None
    assert compare(spark, nearempty_oracle, fn, sql, nearempty_dir) == []


# --- all-NULL column slices (r07 null-column fuzz findings) ------------------
#
# documents.text all NULL: missing assets (multimodal decode /
# framesample None payloads), zero-token ROUGE denominators, and the
# CSV/JSON NULL round-trip fidelity count.
NULL_TEXT_QIDS = (
    "q_eval_rouge",
    "q_multimodal_decode",
    "q_multimodal_framesample",
    "q_src_multiformat",
)

# events.value all NULL: the observation substrate's reading-validity
# boundary (obs.py WHERE value IS NOT NULL — without it the WOW chain
# and stream machines disagree on three-valued logic through mirrored
# CASE spellings), the histogram's NULL bin ordering, and the
# grouped-map UDF's NaN -> int64-min sentinel leak.
NULL_VALUE_QIDS = (
    "q_agg_histogram",
    "q_sink_http_form",
    "q_udf_grouped_map",
    "q_stream_stateful",
)

# embeddings.embedding all NULL: posexplode drops NULL-array rows
# where the oracles' range-spine unnest kept NULL cells — unembedded
# vectors are now boundary-filtered on both sides.
NULL_EMBED_QIDS = (
    "q_kmeans_step",
    "q_pca_power",
)


@pytest.fixture(scope="module")
def nulltext_dir(sf_smoke):
    return materialize_slice(
        sf_smoke, seed=5, keep_permille=1000, nullify={("documents", "text"): 1000}
    )


@pytest.fixture(scope="module")
def nullvalue_dir(sf_smoke):
    return materialize_slice(
        sf_smoke, seed=5, keep_permille=1000, nullify={("events", "value"): 1000}
    )


@pytest.fixture(scope="module")
def nullembed_dir(sf_smoke):
    return materialize_slice(
        sf_smoke,
        seed=5,
        keep_permille=1000,
        nullify={("embeddings", "embedding"): 1000},
    )


@pytest.mark.parametrize("qid", NULL_TEXT_QIDS)
def test_nulltext_slice_parity(qid, spark, nulltext_dir):
    fn, sql = REG[qid]
    con = connect_oracle(nulltext_dir)
    try:
        assert compare(spark, con, fn, sql, nulltext_dir) == []
    finally:
        con.close()


@pytest.mark.parametrize("qid", NULL_VALUE_QIDS)
def test_nullvalue_slice_parity(qid, spark, nullvalue_dir):
    fn, sql = REG[qid]
    con = connect_oracle(nullvalue_dir)
    try:
        assert compare(spark, con, fn, sql, nullvalue_dir) == []
    finally:
        con.close()


@pytest.mark.parametrize("qid", NULL_EMBED_QIDS)
def test_nullembed_slice_parity(qid, spark, nullembed_dir):
    fn, sql = REG[qid]
    con = connect_oracle(nullembed_dir)
    try:
        assert compare(spark, con, fn, sql, nullembed_dir) == []
    finally:
        con.close()
