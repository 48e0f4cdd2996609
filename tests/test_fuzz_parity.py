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


@pytest.fixture(scope="module")
def null_fuzz_dir(sf_smoke):
    """Slice with 35% of lineitem orders' l_extendedprice nulled — the
    testdata is NULL-free, so this is the only slice shape that pushes
    NULLs through both engines at once (r07)."""
    return materialize_slice(
        sf_smoke,
        seed=3,
        keep_permille=600,
        nullify={("lineitem", "l_extendedprice"): 350},
    )


def test_nullified_slice_has_nulls_and_keeps_parity(spark, null_fuzz_dir):
    import pyarrow.parquet as pq

    li = pq.read_table(f"{null_fuzz_dir}/lineitem.parquet")
    assert li.column("l_extendedprice").null_count > 0
    con = connect_oracle(null_fuzz_dir)
    try:
        fn, sql = REG["q_abc_classification"]
        assert not compare(spark, con, fn, sql, null_fuzz_dir)
    finally:
        con.close()


def test_null_leading_running_probe_parity(spark, fuzz_dir):
    """The distributed running sum over an all-NULL leading sort prefix
    (global_order_stats' non-null-count recombination) must match SQL's
    NULL-while-no-non-null-prefix window semantics cross-engine — the
    registry's own running sums never produce NULL values, so only this
    tool-local pair covers the branch end-to-end (VERDICT r06 item 5)."""
    from tools.fuzz_parity import _null_leading_probe

    build, sql = _null_leading_probe()
    con = connect_oracle(fuzz_dir)
    try:
        assert not compare(spark, con, build, sql, fuzz_dir)
        # non-vacuous: the slice must actually yield NULL cum rows
        rows = build(spark, fuzz_dir).collect()
        assert any(r["cum"] is None for r in rows)
        assert any(r["cum"] is not None for r in rows)
    finally:
        con.close()


def test_mask_streams_are_independent_under_conditioning():
    """The r10 mask-correlation regression guard (no Spark, pure
    numpy): under the original affine hash, every 'decorrelated' mask
    was a constant SHIFT of the keep mask, so conditioned on
    keep<1000‰ a secondary mask could select ZERO rows (the r09
    stress battery's nullify axes at keep=500 mutated nothing). With
    the splitmix64 avalanche, masks at different seeds must behave
    independently: the conditional hit rate of every secondary seed
    stream, given keep, stays near its unconditional permille."""
    import numpy as np

    from tools.fuzz_parity import _keep_mask

    keys = np.arange(1, 200_001, dtype=np.int64)
    for seed in (1, 2, 3, 19, 23):
        keep = _keep_mask(keys, seed, 500)
        assert abs(keep.mean() - 0.5) < 0.02
        # the harness's actual secondary streams for this seed
        for s2, p in (
            (seed * 31 + 7, 150),        # nullify (j=0)
            (seed * 31 + 7 + 104729, 150),  # nullify (j=1)
            (seed * 17 + 3, 150),        # dupkey
            (seed * 13 + 5, 150),        # duprows
            (seed * 23 + 11, 300),       # nullgroup
        ):
            m2 = _keep_mask(keys, s2, p)
            cond = m2[keep].mean()
            # affine-shift failure mode is cond == 0.0 or ~2x target;
            # independence keeps it within a tight band of p/1000
            assert abs(cond - p / 1000) < 0.02, (
                f"seed {seed}/{s2}: conditional rate {cond:.4f} far "
                f"from {p / 1000} — mask streams correlated"
            )
