"""Composite analytical queries (TPC-H-shaped) over the driver star
schema — multi-join, multi-stage plans proving the engine composes:
join ordering + broadcast selection (Catalyst/AQE), partial
aggregation, semi/anti-join decorrelation, and top-k, all in single
declarative plans.

Pure EXT (the reference is a single-row ETL job); the shapes are the
classic warehouse workloads a user of this engine runs against the
same tables (shipping priority, local-supplier volume, returned
items, late orders, supplier-diversity).

Money parity: every revenue aggregate goes through the integer-cents
pattern (exact per-row ``floor(x*100+0.5)`` into BIGINT, order-free
integer sums, one final /100.0) so Spark's partial-agg tree and
DuckDB agree bitwise.

Scale notes: dimension sides (region/nation/customer/supplier/part)
broadcast; the fact-fact joins (orders x lineitem) shuffle on
orderkey — at 100 TB both sides would be bucketed on orderkey to
make that a zero-shuffle sort-merge. Filters sit directly on scans
(pushdown verified by tests/test_plans.py patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metoffice_spark.io import load
from metoffice_spark.session import tune


def _rev_cents(price: str = "l_extendedprice", disc: str = "l_discount"):
    return F.floor(
        F.col(price) * (F.lit(1.0) - F.col(disc)) * F.lit(100.0) + F.lit(0.5)
    ).cast("bigint")


_REV_CENTS_SQL = (
    "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)"
)


# --- Q3 shape: shipping priority ---------------------------------------------

def q_olap_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILDING-segment orders not yet shipped at the cutoff: customer
    (broadcast) x orders x lineitem, revenue per order, top 10.

    Plan: customer dim broadcasts into orders; the orders x lineitem
    equi-join shuffles on orderkey (bucketable at scale); top-k is
    TakeOrderedAndProject — no global sort."""
    spark = tune(spark)
    cutoff = "TIMESTAMP '1998-06-01 00:00:00'"
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.expr(f"o_orderdate < {cutoff}"))
    li = load(spark, sf_dir, "lineitem").filter(F.expr(f"l_shipdate > {cutoff}"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_rev_cents()).alias("rev_cents")
    )
    return (
        agg.select(
            "l_orderkey",
            "o_orderdate",
            (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_OLAP_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, o_orderdate,
       sum({_REV_CENTS_SQL}) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5 shape: local supplier volume -----------------------------------------

def q_olap_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from orders where the customer and supplier share a
    nation, per EUROPE nation, one year. Six-table join: all four
    dims broadcast, the two facts shuffle on orderkey only."""
    spark = tune(spark)
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
        )
    )
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
        .select("n_name", (F.col("rev_cents") / F.lit(100.0)).alias("revenue"))
    )


ORACLE_OLAP_LOCAL_SUPPLIER = f"""
SELECT n_name, sum({_REV_CENTS_SQL}) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# --- Q10 shape: returned-item reporting --------------------------------------

def q_olap_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned goods in a quarter, ranked by lost
    revenue, top 20 — the classic churn report."""
    spark = tune(spark)
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'"
        )
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(_rev_cents()).alias("rev_cents")
    )
    return (
        agg.select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_OLAP_RETURNED_ITEMS = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       sum({_REV_CENTS_SQL}) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q4 shape: order-priority checking (EXISTS semi join) --------------------

def q_olap_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one line shipped after the order date
    (late shipment), counted by priority — EXISTS decorrelated to a
    left-semi join on orderkey."""
    spark = tune(spark)
    orders = load(spark, sf_dir, "orders").filter(
        F.expr(
            "o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'"
            " AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'"
        )
    )
    li = load(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    sem = orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .select("o_orderpriority", "order_count")
    )


ORACLE_OLAP_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --- Q16 shape: supplier diversity per part brand (distinct + anti join) -----

def q_olap_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers shipping each small-part brand, excluding
    suppliers in arrears (anti join) — distinct-agg + anti-join in one
    plan."""
    spark = tune(spark)
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = load(spark, sf_dir, "lineitem")
    ok_lines = li.join(
        F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    joined = ok_lines.join(F.broadcast(part), ok_lines.l_partkey == part.p_partkey)
    return (
        joined.groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .select("p_brand", "supplier_cnt")
    )


ORACLE_OLAP_PARTS_SUPPLIERS = """
SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand
"""


QUERIES = {
    "q_olap_shipping_priority": (q_olap_shipping_priority, ORACLE_OLAP_SHIPPING_PRIORITY),
    "q_olap_local_supplier": (q_olap_local_supplier, ORACLE_OLAP_LOCAL_SUPPLIER),
    "q_olap_returned_items": (q_olap_returned_items, ORACLE_OLAP_RETURNED_ITEMS),
    "q_olap_order_priority": (q_olap_order_priority, ORACLE_OLAP_ORDER_PRIORITY),
    "q_olap_parts_suppliers": (q_olap_parts_suppliers, ORACLE_OLAP_PARTS_SUPPLIERS),
}
