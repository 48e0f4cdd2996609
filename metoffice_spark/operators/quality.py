"""Data-quality validation and change-data-capture operators — the
pipeline-governance surface (dbt-test / Deequ-shaped checks, snapshot
diffing) a production deployment runs beside its queries.

Pure EXT (no reference analog; the reference trusts its inputs). Same
cross-engine determinism discipline as the rest of the repo: integer
counts everywhere, one final IEEE divide on exact ints.

Scale design (100 TB):
- every check is an aggregate with map-side combine over one scan of
  the checked table (checks share the pass, not one scan per check);
- referential checks ride the fact scan via a broadcast left join
  against the dim key set (no second scan, no anti-join pass);
- the CDC diff is one full-outer join keyed on the primary key —
  co-located (zero-shuffle) when both snapshots are bucketed alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metoffice_spark.io import load
from metoffice_spark.session import tune

QUERIES: dict = {}


# --- q_dq_checks: declarative table validations ------------------------------


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per data-quality check: (check_name, n_checked,
    n_violations, pass). Checks: primary-key uniqueness, not-null,
    referential integrity (orders→customer), and domain ranges
    (discount ∈ [0,1], quantity > 0).

    Scale: the three lineitem range/null checks share ONE scan (a
    single aggregate computes them all); the orders scan serves BOTH
    the PK-uniqueness count and the FK-orphan count (broadcast left
    join + null count). No check shuffles row bodies — counts only."""
    spark = tune(spark)
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    li_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("bad_qty"),
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)).alias(
            "bad_disc"
        ),
        F.count(F.when(F.col("l_shipdate").isNull(), 1)).alias("null_ship"),
    )
    # one scan of orders serves BOTH the uniqueness and the FK check:
    # broadcast-left-join the dim key set, count nulls instead of a
    # second anti-join scan
    ord_agg = (
        orders.join(
            F.broadcast(
                cust.select(F.col("c_custkey").alias("o_custkey"))
                .distinct()
                .withColumn("known", F.lit(1))
            ),
            "o_custkey",
            "left",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk"),
            F.count(F.when(F.col("known").isNull(), 1)).alias("n_orphans"),
        )
    )

    # The three lineitem checks EXPLODE out of the one aggregate row —
    # a 3-branch union would re-plan (and re-run) the scan per branch
    # (no CSE across union branches; same trap as the pagerank edges).
    def crow(name: str, checked, viol):
        return F.struct(
            F.lit(name).alias("check_name"),
            checked.cast("bigint").alias("n_checked"),
            viol.cast("bigint").alias("n_violations"),
        )

    li_rows = li_agg.select(
        F.explode(
            F.array(
                crow("lineitem_quantity_positive", F.col("n"), F.col("bad_qty")),
                crow("lineitem_discount_in_range", F.col("n"), F.col("bad_disc")),
                crow("lineitem_shipdate_not_null", F.col("n"), F.col("null_ship")),
            )
        ).alias("c")
    ).select("c.*")
    ord_rows = ord_agg.select(
        F.explode(
            F.array(
                crow("orders_pk_unique", F.col("n"), F.col("dup_pk")),
                crow(
                    "orders_custkey_references_customer",
                    F.lit(None).cast("bigint"),
                    F.col("n_orphans"),
                ),
            )
        ).alias("c")
    ).select("c.*")
    return li_rows.unionByName(ord_rows).withColumn(
        "pass", F.col("n_violations") == 0
    )


ORACLE_DQ_CHECKS = """
WITH li_agg AS (
  SELECT count(*) AS n,
         count(CASE WHEN l_quantity <= 0 THEN 1 END) AS bad_qty,
         count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS bad_disc,
         count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS null_ship
  FROM lineitem
),
ord_agg AS (
  SELECT count(*) AS n, count(*) - count(DISTINCT o_orderkey) AS dup_pk FROM orders
),
orph AS (
  SELECT count(*) AS n_orphans FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT 'lineitem_quantity_positive' AS check_name,
       CAST(n AS BIGINT) AS n_checked, CAST(bad_qty AS BIGINT) AS n_violations,
       bad_qty = 0 AS pass FROM li_agg
UNION ALL
SELECT 'lineitem_discount_in_range', CAST(n AS BIGINT), CAST(bad_disc AS BIGINT),
       bad_disc = 0 FROM li_agg
UNION ALL
SELECT 'lineitem_shipdate_not_null', CAST(n AS BIGINT), CAST(null_ship AS BIGINT),
       null_ship = 0 FROM li_agg
UNION ALL
SELECT 'orders_pk_unique', CAST(n AS BIGINT), CAST(dup_pk AS BIGINT),
       dup_pk = 0 FROM ord_agg
UNION ALL
SELECT 'orders_custkey_references_customer', CAST(NULL AS BIGINT),
       CAST(n_orphans AS BIGINT), n_orphans = 0 FROM orph
"""

QUERIES["q_dq_checks"] = (q_dq_checks, ORACLE_DQ_CHECKS)


# --- q_cdc_diff: snapshot change-data-capture --------------------------------
#
# Two deterministic snapshots of the customer table are derived
# in-query (old: keys not ≡0 mod 10, new: keys not ≡0 mod 7, with
# every key ≡0 mod 5 moved to a new nation), then diffed by primary
# key into an insert/delete/update/unchanged changelog — the CDC feed
# a downstream incremental pipeline (q_incr_agg's delta) consumes.


def q_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog summary per op: (op, n_rows, sample min/max keys).

    Scale: ONE full-outer join keyed on the primary key; with both
    snapshots bucketed on the key (q_join_bucketed layout) this is
    zero-shuffle; op classification is a map-side CASE."""
    spark = tune(spark)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    old = cust.filter(F.col("c_custkey") % 10 != 0)
    new = cust.filter(F.col("c_custkey") % 7 != 0).withColumn(
        "c_nationkey",
        F.when(F.col("c_custkey") % 5 == 0, (F.col("c_nationkey") + 1) % 25).otherwise(
            F.col("c_nationkey")
        ),
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer"
    )
    op = (
        F.when(F.col("o.c_custkey").isNull(), F.lit("insert"))
        .when(F.col("n.c_custkey").isNull(), F.lit("delete"))
        .when(
            (F.col("o.c_nationkey") != F.col("n.c_nationkey"))
            | (F.col("o.c_mktsegment") != F.col("n.c_mktsegment")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
    )
    key = F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey"))
    return (
        j.select(op.alias("op"), key.alias("k"))
        .groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
    )


ORACLE_CDC_DIFF = """
WITH old AS (
  SELECT c_custkey, c_nationkey, c_mktsegment FROM customer WHERE c_custkey % 10 <> 0
),
new AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey,
         c_mktsegment
  FROM customer WHERE c_custkey % 7 <> 0
),
diff AS (
  SELECT CASE WHEN o.c_custkey IS NULL THEN 'insert'
              WHEN n.c_custkey IS NULL THEN 'delete'
              WHEN o.c_nationkey <> n.c_nationkey
                   OR o.c_mktsegment <> n.c_mktsegment THEN 'update'
              ELSE 'unchanged' END AS op,
         COALESCE(o.c_custkey, n.c_custkey) AS k
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT op, count(*) AS n_rows, min(k) AS min_key, max(k) AS max_key
FROM diff GROUP BY op
"""

QUERIES["q_cdc_diff"] = (q_cdc_diff, ORACLE_CDC_DIFF)
