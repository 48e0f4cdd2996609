"""Fuzzed-slice parity: representative queries must match their DuckDB
oracles on a deterministically SAMPLED copy of the fixture, not just on
the fixture itself (tools/fuzz_parity.py materializes the slice; see
its docstring for the sampling scheme). A pass tuned to the seed-42
fixture — a constant valid only at its row count, a branch only one
fixture row hits — fails here even though the stock gate is green.

One representative per operator-module family, non-streaming, chosen
for data-dependent surface (hash families, windows, sketches,
quantiles, candidate generation). The FULL registry runs against two
fuzzed slices per round via tools/fuzz_parity.py (committed as
artifacts/FUZZPARITY_r06_*.log); this test keeps the property alive in
every pytest run at ~2 min cost.
"""

from __future__ import annotations

import pytest

from metoffice_spark.oracle_check import compare, connect_oracle
from metoffice_spark.registry import _collect

from tools.fuzz_parity import materialize_slice

REG = _collect()

# one per module family; all have oracles and finish in seconds at the
# fuzzed sf0.001 slice
REPRESENTATIVES = (
    "q_agg_hash",            # relational: scan+agg
    "q_join_asof",           # relational: as-of join
    "q_rain_daily_delta",    # rain: observation substrate + windows
    "q_percentile_exact",    # analytics: exact quantiles
    "q_interval_sweep",      # temporal: sweep-line
    "q_dedup_fuzzy",         # llm: MinHash/LSH banding
    "q_text_fingerprint",    # text: rolling-hash fingerprints
    "q_pack_sequences",      # pipeline: greedy packing
    "q_rank_bm25",           # curation: posting lists + IDF
    "q_eval_auc",            # stats: rank statistics
    "q_weighted_median",     # prep: distributed weighted quantile
    "q_skyline_pareto",      # warehouse: dominance windows
    "q_topk_twophase",       # scale: salted two-phase top-k
    "q_sketch_hll_merge",    # sketches: register-level merge
)


@pytest.fixture(scope="module")
def fuzz_dir(sf_smoke):
    return materialize_slice(sf_smoke, seed=3, keep_permille=600)


@pytest.fixture(scope="module")
def fuzz_oracle(fuzz_dir):
    con = connect_oracle(fuzz_dir)
    yield con
    con.close()


@pytest.mark.parametrize("qid", REPRESENTATIVES)
def test_fuzzed_slice_parity(qid, spark, fuzz_oracle, fuzz_dir):
    fn, sql = REG[qid]
    assert sql is not None
    problems = compare(spark, fuzz_oracle, fn, sql, fuzz_dir)
    assert not problems, f"{qid} on fuzzed slice: " + "; ".join(problems[:3])
