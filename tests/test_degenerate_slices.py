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
