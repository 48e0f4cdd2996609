"""Warehouse / pipeline-governance operators (SURVEY.md §2.26,
round 5h): RFM customer segmentation, top event paths, and
order-free dataset fingerprints for reproducibility manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metoffice_spark.io import load
from metoffice_spark.session import scoped_persist, tune

QUERIES: dict = {}


# shared-dialect hex→int: instr() and substring() behave identically
# in Spark SQL and DuckDB (the _SK_FRAC / _bf_positions idiom), so one
# expression string serves both engines.
def _hexn(h: str, n: int) -> str:
    # per-term CAST to BIGINT: Spark runs ANSI mode and INT * 16^7+
    # literals overflow int32 before widening; DuckDB accepts the
    # cast unchanged.
    terms = " + ".join(
        f"CAST(instr('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"({terms})"


# --- q_rfm_segmentation: recency / frequency / monetary scoring ---------------
#
# The classic CRM segmentation: per customer, days since last order
# (recency), order count (frequency), lifetime spend in cents
# (monetary); each scored into quintiles by ntile(5) over a TOTAL
# order (metric + custkey tie-break — both engines distribute ntile
# remainders to the leading buckets, so the assignment is identical),
# then a named segment from the score triple. Output is the segment
# census plus each segment's exact metric means (fixed point).
#
# Scale: one orders shuffle on custkey; the three ntile windows are
# global sorts of the CUSTOMER table (small next to orders) — at
# 100 TB the quintile cutoffs would come from approx_percentile
# instead; the exact form is what the oracle can check bitwise. The
# observation-date scalar broadcasts via 1-row crossJoin.


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per RFM segment: customer count and exact mean
    recency/frequency/monetary (1e-6 fixed point)."""
    spark = tune(spark)
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias("cents"),
    )
    per_cust = scoped_persist(
        orders.groupBy("o_custkey").agg(
            F.max("d").alias("last_d"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("cents").cast("bigint").alias("money"),
        )
    )
    obs = per_cust.agg(F.max("last_d").alias("obs_d"))
    rfm = per_cust.crossJoin(F.broadcast(obs)).select(
        "o_custkey",
        F.expr("cast(datediff(obs_d, last_d) as bigint)").alias("rec"),
        "freq",
        "money",
    )
    scored = rfm.select(
        "o_custkey",
        "rec",
        "freq",
        "money",
        F.ntile(5)
        .over(Window.orderBy(F.col("rec").desc(), F.col("o_custkey").asc()))
        .cast("int")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("freq").asc(), F.col("o_custkey").asc()))
        .cast("int")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("money").asc(), F.col("o_custkey").asc()))
        .cast("int")
        .alias("m_score"),
    )
    seg = (
        "CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4"
        " THEN 'champion'"
        " WHEN r_score >= 4 AND f_score <= 2 THEN 'new'"
        " WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'"
        " WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'"
        " ELSE 'core' END"
    )
    return (
        scored.select(F.expr(seg).alias("segment"), "rec", "freq", "money")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("cast(1000000 * sum(rec) div count(1) as bigint)").alias(
                "avg_recency_fp"
            ),
            F.expr("cast(1000000 * sum(freq) div count(1) as bigint)").alias(
                "avg_freq_fp"
            ),
            F.expr("cast(1000000 * sum(money) div count(1) as bigint)").alias(
                "avg_money_fp"
            ),
        )
    )


ORACLE_RFM = """
WITH per_cust AS (
  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_d,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS money
  FROM orders GROUP BY o_custkey
),
obs AS (SELECT max(last_d) AS obs_d FROM per_cust),
rfm AS (
  SELECT o_custkey,
         CAST(datediff('day', last_d, obs_d) AS BIGINT) AS rec, freq, money
  FROM per_cust CROSS JOIN obs
),
scored AS (
  SELECT o_custkey, rec, freq, money,
         CAST(ntile(5) OVER (ORDER BY rec DESC, o_custkey ASC) AS INT)
           AS r_score,
         CAST(ntile(5) OVER (ORDER BY freq ASC, o_custkey ASC) AS INT)
           AS f_score,
         CAST(ntile(5) OVER (ORDER BY money ASC, o_custkey ASC) AS INT)
           AS m_score
  FROM rfm
),
seg AS (
  SELECT CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
              THEN 'champion'
              WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
              WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
              WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
              ELSE 'core' END AS segment,
         rec, freq, money
  FROM scored
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(1000000 * CAST(sum(rec) AS BIGINT) // count(*) AS BIGINT)
         AS avg_recency_fp,
       CAST(1000000 * CAST(sum(freq) AS BIGINT) // count(*) AS BIGINT)
         AS avg_freq_fp,
       CAST(1000000 * CAST(sum(money) AS BIGINT) // count(*) AS BIGINT)
         AS avg_money_fp
FROM seg GROUP BY segment
"""

QUERIES["q_rfm_segmentation"] = (q_rfm_segmentation, ORACLE_RFM)


# --- q_event_paths: top length-3 behavior paths -------------------------------
#
# Path analysis (the Sankey feed): per user, every window of three
# consecutive events by (ts, event_id) becomes a 'a>b>c' path
# string; the top 20 paths by count. Complements q_markov_transitions
# (1-step) and q_pattern_match (fixed regex): this enumerates the
# actual frequent trigram paths.
#
# Scale: the lead window is bounded by user_id partitions; the path
# aggregate shuffles short strings; top-k is TakeOrdered.

_PATH_TOPK = 20


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 'a>b>c' consecutive event-type paths with counts."""
    spark = tune(spark)
    # event_type IS NOT NULL: Spark's concat_ws SKIPS null arguments
    # while the oracle's || propagates NULL — a NULL type row would
    # silently produce a 2-element path on one engine and a NULL
    # group on the other, so nulls are excluded explicitly BOTH sides.
    ev = (
        load(spark, sf_dir, "events")
        .filter("event_type IS NOT NULL")
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    paths = (
        ev.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .filter("t1 IS NOT NULL AND t2 IS NOT NULL")
        .select(
            F.concat_ws(">", F.col("event_type"), F.col("t1"), F.col("t2")).alias(
                "path"
            )
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return paths.orderBy(F.col("n").desc(), F.col("path").asc()).limit(_PATH_TOPK)


ORACLE_EVENT_PATHS = f"""
WITH seq AS (
  SELECT event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events WHERE event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT event_type || '>' || t1 || '>' || t2 AS path,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
GROUP BY event_type || '>' || t1 || '>' || t2
ORDER BY n DESC, path ASC
LIMIT {_PATH_TOPK}
"""

QUERIES["q_event_paths"] = (q_event_paths, ORACLE_EVENT_PATHS)


# --- q_dataset_fingerprint: order-free shard checksums ------------------------
#
# The reproducibility manifest a pipeline stamps on every materialized
# dataset: per shard (doc_id mod 16), the row count, an order-free
# additive checksum (sum of 32-bit md5 slices of the canonical row
# string — commutative, so partition order and merge order cannot
# change it), and an order-free bit_xor checksum over 48-bit slices,
# plus the whole-dataset ROLLUP row. Two independent families (add
# and xor) so a swapped-row-pair regression cannot cancel in both.
#
# Overflow: 32-bit terms sum within int64 up to ~4e9 rows per shard.
# Scale: one map-side hash + a shard-keyed rollup aggregate; no
# sorts, no joins.

_FP_SHARDS = 16


def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per shard (and the ROLLUP total): row count, additive 32-bit
    checksum, xor 48-bit checksum."""
    spark = tune(spark)
    docs = load(spark, sf_dir, "documents")
    row_h = (
        "md5(concat(cast(doc_id as string), '|', lang, '|', source, '|', "
        "cast(n_chars as string)))"
    )
    hashed = docs.select(
        (F.col("doc_id") % _FP_SHARDS).cast("int").alias("shard"),
        F.expr(_hexn(row_h, 8)).cast("bigint").alias("h32"),
        F.expr(_hexn(row_h, 12)).cast("bigint").alias("h48"),
    )
    return (
        hashed.rollup("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("h32").cast("bigint").alias("checksum_add"),
            F.expr("bit_xor(h48)").cast("bigint").alias("checksum_xor"),
        )
        .select(
            F.coalesce(F.col("shard"), F.lit(-1)).cast("int").alias("shard"),
            "n_rows",
            "checksum_add",
            "checksum_xor",
        )
    )


def _fp_oracle() -> str:
    row_h = (
        "md5(CAST(doc_id AS VARCHAR) || '|' || lang || '|' || source || '|' "
        "|| CAST(n_chars AS VARCHAR))"
    )
    return f"""
WITH hashed AS (
  SELECT CAST(doc_id % {_FP_SHARDS} AS INT) AS shard,
         CAST({_hexn(row_h, 8)} AS BIGINT) AS h32,
         CAST({_hexn(row_h, 12)} AS BIGINT) AS h48
  FROM documents
)
SELECT CAST(coalesce(shard, -1) AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(h32) AS BIGINT) AS checksum_add,
       CAST(bit_xor(h48) AS BIGINT) AS checksum_xor
FROM hashed GROUP BY ROLLUP (shard)
"""


QUERIES["q_dataset_fingerprint"] = (q_dataset_fingerprint, _fp_oracle())
