"""Distributed global-order primitives (prefix sums / ranks / ntiles).

A ``Window.orderBy(...)`` with no ``partitionBy`` funnels EVERY row
through one task ("WindowExec: No Partition Defined") — fine over a
bounded intermediate (a decile table, a sketch, per-partition
offsets), a scale-killer over anything that grows with the data
(per-customer, per-part, per-document aggregates: linear in SF, ~1e8
rows at the 100 TB design point).

These helpers compute the SAME total-order statistics with the
classic two-phase distributed prefix pattern:

1. ``repartitionByRange`` on the sort key — partition p holds keys
   strictly below partition p+1 (one wide shuffle, the same data
   movement the single-partition sort would have needed anyway);
2. a PARTITIONED window per range-partition id computes the local
   statistic (row_number / running sum) in parallel;
3. per-partition totals — at most ``spark.sql.shuffle.partitions``
   rows — are turned into cumulative offsets with a global window
   over that BOUNDED table and broadcast back.

The two branches share the range exchange (ReusedExchange), so the
plan costs one wide shuffle + one tiny agg + one broadcast join.

REQUIREMENT: ``order_cols`` must be a deterministic TOTAL order
(include a tiebreaker). Rows comparing equal may straddle a range
boundary, so only a total order makes the assigned rank/prefix
reproducible — the same requirement oracle parity already imposes on
every call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gpid"
_LOCAL = "__glocal"
_OFF = "__goff"
_TOT = "__gtot"


def _ranged(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartitionByRange(parts, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )


def _offsets(d: DataFrame, per_part: Column) -> DataFrame:
    """Per-range-partition cumulative offsets: ≤ shuffle-partitions
    rows, the ONLY place a global window appears (bounded by conf,
    not by data)."""
    per = d.groupBy(_PID).agg(per_part.alias("_n"))
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    return per.select(
        _PID,
        F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("bigint").alias(_OFF),
        F.sum("_n").over(Window.partitionBy()).cast("bigint").alias(_TOT),
    )


def global_row_number(
    df: DataFrame, order_cols: list[Column], out: str = "rn"
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` without a global
    single-partition window. ``order_cols`` must be a total order."""
    d = _ranged(df, order_cols)
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    d = d.withColumn(_LOCAL, F.row_number().over(w_local).cast("bigint"))
    off = _offsets(d, F.count(F.lit(1)).cast("bigint"))
    return (
        d.join(F.broadcast(off), _PID)
        .withColumn(out, (F.col(_LOCAL) + F.col(_OFF)).cast("bigint"))
        .drop(_PID, _LOCAL, _OFF, _TOT)
    )


def global_ntile(
    df: DataFrame, order_cols: list[Column], n: int, out: str = "tile"
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order_cols)`` distributed: derived
    from the global row number and total count with the ANSI bucket
    rule (first ``cnt % n`` buckets get ``cnt div n + 1`` rows)."""
    d = _ranged(df, order_cols)
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    d = d.withColumn(_LOCAL, F.row_number().over(w_local).cast("bigint"))
    off = _offsets(d, F.count(F.lit(1)).cast("bigint"))
    rn = F.col(_LOCAL) + F.col(_OFF)
    small = F.floor(F.col(_TOT) / n)  # rows per small bucket
    big = (F.col(_TOT) % n) * (small + 1)  # rows covered by big buckets
    tile = F.when(
        F.col(_TOT) < n, rn  # fewer rows than tiles: bucket == rn
    ).otherwise(
        F.when(rn <= big, F.ceil(rn / (small + 1))).otherwise(
            (F.col(_TOT) % n) + F.ceil((rn - big) / small)
        )
    )
    return (
        d.join(F.broadcast(off), _PID)
        .withColumn(out, tile.cast("int"))
        .drop(_PID, _LOCAL, _OFF, _TOT)
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    val: Column,
    out: str = "cum",
    with_total: str | None = None,
) -> DataFrame:
    """``sum(val) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING
    TO CURRENT ROW)`` distributed; optionally also the grand total
    (``with_total`` column name) from the same bounded offsets table
    instead of a second global window."""
    d = _ranged(df, order_cols).withColumn("__gval", val.cast("bigint"))
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn(_LOCAL, F.sum("__gval").over(w_local).cast("bigint"))
    off = _offsets(d, F.sum("__gval").cast("bigint"))
    res = d.join(F.broadcast(off), _PID).withColumn(
        out, (F.col(_LOCAL) + F.col(_OFF)).cast("bigint")
    )
    if with_total is not None:
        res = res.withColumn(with_total, F.col(_TOT))
    return res.drop(_PID, _LOCAL, _OFF, _TOT, "__gval")
