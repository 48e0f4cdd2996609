"""Semantic + plan-shape tests for the scale-technique operators
(scale.py): the two-phase top-k really equals the one-shot window,
the Bloom filter never loses a true match, the CMS estimate is a
valid overcount, and the Bloom probe stays broadcast-only."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_incr_agg_merge_equals_batch(spark, sf_smoke):
    """Merged base+delta partials must equal the direct aggregate."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.scale import q_incr_agg

    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n_rows"], r["qty_fp"])
        for r in q_incr_agg(spark, sf_smoke).collect()
    }
    li = load(spark, sf_smoke, "lineitem")
    direct = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["q"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("l_quantity") * 100 + 0.5).cast("bigint")).alias("q"),
        )
        .collect()
    }
    assert got == direct


def test_topk_twophase_equals_single_window(spark, sf_smoke):
    from metoffice_spark.io import load
    from metoffice_spark.operators.scale import _TOPK_K, q_topk_twophase

    got = {
        (r["l_returnflag"], r["rk"]): (r["l_orderkey"], r["l_linenumber"])
        for r in q_topk_twophase(spark, sf_smoke).collect()
    }
    li = load(spark, sf_smoke, "lineitem").withColumn(
        "price_fp", F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("price_fp").desc(), "l_orderkey", "l_linenumber"
    )
    want = {
        (r["l_returnflag"], r["rk"]): (r["l_orderkey"], r["l_linenumber"])
        for r in li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK_K)
        .collect()
    }
    assert got == want
    # every group carries exactly ranks 1..K
    by_group: dict = {}
    for (flag, rk) in got:
        by_group.setdefault(flag, set()).add(rk)
    assert all(rks == set(range(1, _TOPK_K + 1)) for rks in by_group.values())


def test_bloom_never_drops_a_true_match(spark, sf_smoke):
    """n_matches summed over priorities == the exact semi-join count
    (a Bloom filter has false positives, never false negatives), and
    candidates >= matches row-wise."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.scale import _BLOOM_SEG, q_join_bloom

    rows = q_join_bloom(spark, sf_smoke).collect()
    assert all(r["n_candidates"] >= r["n_matches"] for r in rows)
    assert all(r["n_false_pos"] == r["n_candidates"] - r["n_matches"] for r in rows)
    cust = load(spark, sf_smoke, "customer").filter(F.col("c_mktsegment") == _BLOOM_SEG)
    exact = (
        load(spark, sf_smoke, "orders")
        .join(
            cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_semi",
        )
        .count()
    )
    assert sum(r["n_matches"] for r in rows) == exact


def test_bloom_probe_is_broadcast_only(spark, sf_smoke):
    """The fact side must meet the bit-sets and the dim keys via
    broadcast joins only — no shuffle exchange of orders before the
    final aggregate."""
    from metoffice_spark.operators.scale import q_join_bloom

    plan = _plan(q_join_bloom(spark, sf_smoke))
    assert plan.count("BroadcastHashJoin") >= 4  # 3 bit-tests + 1 dim join
    assert "SortMergeJoin" not in plan


def test_cms_estimate_bounds(spark, sf_smoke):
    """CMS is an overcount: exact <= est for every tracked item."""
    from metoffice_spark.operators.scale import _CMS_TRACKED, q_sketch_cms

    rows = q_sketch_cms(spark, sf_smoke).collect()
    assert 0 < len(rows) <= _CMS_TRACKED
    assert all(r["n_exact"] <= r["n_est"] for r in rows)


def test_compaction_collapses_file_count(spark, sf_smoke):
    """After q_sink_compact runs, the compacted dir holds exactly the
    target number of parquet part-files, and content is preserved."""
    import glob
    import os

    from metoffice_spark.operators.ingest import (
        _COMPACT_FILES,
        _COMPACT_ROOTS,
        _FRAG_FILES,
        q_sink_compact,
    )

    rows = q_sink_compact(spark, sf_smoke).collect()
    assert rows
    root = _COMPACT_ROOTS[-1]
    frag = glob.glob(os.path.join(root, "frag", "part-*.parquet"))
    comp = glob.glob(os.path.join(root, "compact", "part-*.parquet"))
    assert len(frag) == _FRAG_FILES
    assert len(comp) == _COMPACT_FILES
    from metoffice_spark.io import load

    assert sum(r["n_events"] for r in rows) == load(spark, sf_smoke, "events").count()


def test_dq_checks_all_pass_on_clean_data(spark, sf_smoke):
    """The generated TPC-H-ish tables are clean: every check passes,
    and the violation counts are exactly zero."""
    from metoffice_spark.operators.quality import q_dq_checks

    rows = q_dq_checks(spark, sf_smoke).collect()
    # +3 in r09 (documents corpus-contract checks), +2 in r10 (the
    # finite-money domain checks of the extreme-value contract),
    # +4 in r12 (the huge-finite fits_fixed_point checks for the
    # lineitem/orders/events money domains, plus events_value_finite),
    # +1 in r13 (embeddings_vector_consumable)
    assert len(rows) == 15
    assert all(r["pass"] and r["n_violations"] == 0 for r in rows)


def test_cdc_diff_partitions_the_key_space(spark, sf_smoke):
    """insert/delete/update/unchanged counts must add up to the union
    of both snapshots' key sets, and each op's count matches the
    modular arithmetic that derived the snapshots."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.quality import q_cdc_diff

    got = {r["op"]: r["n_rows"] for r in q_cdc_diff(spark, sf_smoke).collect()}
    keys = [
        r["c_custkey"]
        for r in load(spark, sf_smoke, "customer").select("c_custkey").collect()
    ]
    old = {k for k in keys if k % 10 != 0}
    new = {k for k in keys if k % 7 != 0}
    want = {
        "insert": len(new - old),
        "delete": len(old - new),
        "update": len({k for k in old & new if k % 5 == 0}),
        "unchanged": len({k for k in old & new if k % 5 != 0}),
    }
    assert got == {k: v for k, v in want.items() if v > 0}
