"""Property tests (hypothesis) for the distributed global-order
primitives: on arbitrary small inputs — duplicates, negatives, NULLs,
skewed keys, any partitioning — row_number, ntile, running sum (with
grand total), and strict prefix min must be BITWISE equal to their
naive single-partition window equivalents. Few examples, each a real
Spark roundtrip, so budgets are tight but the input space (the part
unit tests can't enumerate) is explored."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from metoffice_spark.functions.distributed import (
    global_ntile,
    global_row_number,
    global_running_sum,
    global_strict_prefix_min,
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),  # k: few values, many dups
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
    ),
    min_size=0,
    max_size=60,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, data, parts):
    rows = [Row(k=k, i=i, v=v) for i, (k, v) in enumerate(data)]
    return spark.createDataFrame(rows, "k int, i int, v int").repartition(parts)


def _order():
    return [F.col("k").asc(), F.col("i").asc()]


@given(data=_rows, parts=st.integers(min_value=1, max_value=9))
@_SETTINGS
def test_row_number_property(spark, data, parts):
    df = _df(spark, data, parts)
    naive = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*_order())).cast("bigint")
    )
    dist = global_row_number(df, _order(), out="rn")
    assert sorted(naive.collect(), key=str) == sorted(dist.collect(), key=str)


@given(
    data=_rows,
    parts=st.integers(min_value=1, max_value=9),
    n=st.integers(min_value=1, max_value=13),
)
@_SETTINGS
def test_ntile_property(spark, data, parts, n):
    df = _df(spark, data, parts)
    naive = df.withColumn("t", F.ntile(n).over(Window.orderBy(*_order())))
    dist = global_ntile(df, _order(), n, out="t")
    assert sorted(naive.collect(), key=str) == sorted(dist.collect(), key=str)


@given(data=_rows, parts=st.integers(min_value=1, max_value=9))
@_SETTINGS
def test_running_sum_with_total_property(spark, data, parts):
    df = _df(spark, data, parts)
    w = Window.orderBy(*_order()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = df.withColumn("cum", F.sum("v").over(w).cast("bigint")).withColumn(
        "tot", F.sum("v").over(Window.partitionBy()).cast("bigint")
    )
    dist = global_running_sum(df, _order(), F.col("v"), out="cum", with_total="tot")
    assert sorted(naive.collect(), key=str) == sorted(dist.collect(), key=str)


@given(data=_rows, parts=st.integers(min_value=1, max_value=9))
@_SETTINGS
def test_strict_prefix_min_property(spark, data, parts):
    df = _df(spark, data, parts)
    w = Window.orderBy(F.col("k").asc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    naive = df.select(
        "k", "i", "v", F.min(F.col("v").cast("bigint")).over(w).alias("m")
    )
    dist = global_strict_prefix_min(df, F.col("k"), F.col("v"), out="m").select(
        "k", "i", "v", "m"
    )
    assert sorted(naive.collect(), key=str) == sorted(dist.collect(), key=str)
