"""Distributed global-order primitives vs their naive single-partition
window equivalents — bitwise-equal results, and the only global window
left in the plan is over the bounded per-partition offsets table."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from metoffice_spark.functions.distributed import (
    global_ntile,
    global_order_stats,
    global_row_number,
    global_running_sum,
    global_strict_prefix_min,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 977 rows, heavy duplicate primary keys (k), unique tiebreaker i
    rows = [Row(k=(i * i) % 37, i=i, v=(i % 11) - 5) for i in range(977)]
    return spark.createDataFrame(rows).repartition(13)


def _naive_order():
    return [F.col("k").asc(), F.col("i").asc()]


def test_row_number_matches_naive(skewed):
    naive = skewed.withColumn(
        "rn", F.row_number().over(Window.orderBy(*_naive_order())).cast("bigint")
    )
    dist = global_row_number(skewed, _naive_order(), out="rn")
    assert sorted(naive.collect()) == sorted(dist.collect())


@pytest.mark.parametrize("n", [1, 4, 5, 10, 976, 977, 1000, 2000])
def test_ntile_matches_naive(skewed, n):
    naive = skewed.withColumn(
        "tile", F.ntile(n).over(Window.orderBy(*_naive_order()))
    )
    dist = global_ntile(skewed, _naive_order(), n, out="tile")
    assert sorted(naive.collect()) == sorted(dist.collect())


def test_running_sum_matches_naive(skewed):
    w = Window.orderBy(*_naive_order()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = skewed.withColumn("cum", F.sum("v").over(w).cast("bigint")).withColumn(
        "tot", F.sum("v").over(Window.partitionBy()).cast("bigint")
    )
    dist = global_running_sum(
        skewed, _naive_order(), F.col("v"), out="cum", with_total="tot"
    )
    assert sorted(naive.collect()) == sorted(dist.collect())


def test_desc_order_and_empty_input(spark, skewed):
    order = [F.col("v").desc(), F.col("i").asc()]
    naive = skewed.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )
    dist = global_row_number(skewed, order, out="rn")
    assert sorted(naive.collect()) == sorted(dist.collect())
    empty = skewed.filter(F.lit(False))
    assert global_row_number(empty, _naive_order()).count() == 0
    assert global_running_sum(empty, _naive_order(), F.col("v")).count() == 0


def test_running_sum_null_prefix_matches_naive(spark):
    """A NULL-leading range partition must yield the carried prefix,
    and a globally-NULL prefix must stay NULL — exactly the naive
    window's semantics (the round-6 review reproduction: NULLs
    spanning a partition boundary made the distributed sum NULL where
    the naive window carried 8)."""
    rows = [
        Row(k=i, i=i, v=(None if 8 <= i <= 14 else 1)) for i in range(40)
    ] + [Row(k=-1 - i, i=100 + i, v=None) for i in range(6)]  # NULL head
    df = spark.createDataFrame(rows, "k int, i int, v int").repartition(7)
    w = Window.orderBy("k", "i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = df.withColumn("cum", F.sum("v").over(w).cast("bigint"))
    dist = global_running_sum(df, [F.col("k").asc(), F.col("i").asc()], F.col("v"))
    assert sorted(naive.collect(), key=str) == sorted(dist.collect(), key=str)


def test_combined_stats_one_shuffle(skewed):
    w = Window.orderBy(*_naive_order())
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = skewed.select(
        "k",
        "i",
        "v",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("v").over(w_run).cast("bigint").alias("cum"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
        F.sum("v").over(Window.partitionBy()).cast("bigint").alias("tot"),
    )
    dist = global_order_stats(
        skewed,
        _naive_order(),
        rn="rn",
        running={"cum": F.col("v")},
        total="n",
        grand={"tot": F.col("v")},
    ).select("k", "i", "v", "rn", "cum", "n", "tot")
    assert sorted(naive.collect()) == sorted(dist.collect())
    # Both branches stem from the same range repartition; AQE reuses
    # the exchange when stage boundaries line up (run-dependent), so
    # assert only the hard bound: never more than the two declared
    # range shuffles in the final plan (AQE toString appends the
    # pre-AQE plan — cut it off first).
    plan = dist._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert 1 <= final.count("Exchange rangepartitioning") <= 2


def test_strict_prefix_min_matches_naive(skewed):
    # duplicate keys everywhere: strict-range frame must exclude ties
    w = Window.orderBy(F.col("k").asc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    naive = skewed.select(
        "k", "i", "v", F.min(F.col("v").cast("bigint")).over(w).alias("m")
    )
    dist = global_strict_prefix_min(
        skewed, F.col("k"), F.col("v"), out="m"
    ).select("k", "i", "v", "m")
    assert sorted(naive.collect(), key=str) == sorted(dist.collect(), key=str)


def test_plan_has_no_unbounded_global_window(skewed):
    # shared boundedness rule — see plan_walkers.py (r06 review: one
    # walker for both this helper lock and the repo-wide tripwire)
    from plan_walkers import unbounded_global_windows

    for df in (
        global_row_number(skewed, _naive_order()),
        global_ntile(skewed, _naive_order(), 5),
        global_running_sum(skewed, _naive_order(), F.col("v")),
    ):
        assert unbounded_global_windows(df) == []
    # the naive shape IS flagged by the detector (it tests something)
    naive = skewed.withColumn(
        "rn", F.row_number().over(Window.orderBy(*_naive_order()))
    )
    assert unbounded_global_windows(naive) != []
    # ...including over a per-key AGGREGATE table — the exact
    # pre-migration scale-killer shape the r06 review showed the old
    # Aggregate-below heuristic could not see
    agg_then_rank = (
        skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("k").asc())
            ),
        )
    )
    assert unbounded_global_windows(agg_then_rank) != []
