"""Record-linkage + operational-diagnostic operators (SURVEY.md
§2.20, round 5b).

- fuzzy record linkage by edit distance over the DISTINCT-value
  dictionary: pairwise Levenshtein runs on the value vocabulary
  (bounded, here 64 part names), never on the row cross product —
  the dictionary-first design that makes fuzzy matching feasible on
  a 100 TB fact table whose string column has bounded cardinality;
- join-key skew diagnostics: the frequency-distribution report
  (hottest keys, exact rank-index percentiles of key frequency, a
  skew ratio) an engineer reads before choosing salting / AQE skew
  handling for a shuffle — expressed as an oracle-checked query so
  the diagnostic itself is under the gate.

Determinism: Levenshtein is the classic unit-cost DP, identical in
Spark (levenshtein) and DuckDB (levenshtein); counts are exact
BIGINTs; percentiles use the rank-index (percentile_disc) pattern of
q_percentile_exact; every ordering carries a total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metoffice_spark.io import load
from metoffice_spark.session import scoped_persist, tune

QUERIES: dict = {}


# --- q_link_editdist: dictionary-blocked fuzzy linkage -----------------------

_LINK_MAXDIST = 2


def q_link_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar part-name pairs (Levenshtein <= 2) over the distinct
    name dictionary, with the record-pair fan-out each name pair
    implies (n_parts_a * n_parts_b).

    Scale: distances run on the distinct dictionary (64 names ->
    ~2k ordered pairs) regardless of fact rows; per-name counts
    aggregate with map-side combine; the fan-out product is computed
    from the two counts, never by materializing record pairs."""
    spark = tune(spark)
    part = load(spark, sf_dir, "part")
    names = scoped_persist(
        part.groupBy("p_name").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("cnt").alias("n_parts_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("cnt").alias("n_parts_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= _LINK_MAXDIST)
        .select(
            "name_a",
            "name_b",
            F.col("dist").cast("int").alias("dist"),
            "n_parts_a",
            "n_parts_b",
            (F.col("n_parts_a") * F.col("n_parts_b"))
            .cast("bigint")
            .alias("n_record_pairs"),
        )
    )


ORACLE_LINK_EDITDIST = f"""
WITH names AS (
  SELECT p_name, CAST(count(*) AS BIGINT) AS cnt FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       a.cnt AS n_parts_a, b.cnt AS n_parts_b,
       CAST(a.cnt * b.cnt AS BIGINT) AS n_record_pairs
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_LINK_MAXDIST}
"""

QUERIES["q_link_editdist"] = (q_link_editdist, ORACLE_LINK_EDITDIST)


# --- q_skew_diag: join-key skew diagnostics ----------------------------------
#
# The pre-shuffle report for events.user_id as a join/groupBy key:
# key count, total rows, the hottest key (tie-broken smallest key),
# exact p50/p90/p99 of the per-key frequency distribution
# (percentile_disc rank-index picks: idx = ceil(p * n) as exact
# integer arithmetic), and the skew ratio max/avg in 1e-6 fixed
# point (1e6 * max * n_keys // total — all non-negative integers).
#
# Scale: per-key counts with map-side combine; everything after is
# n_keys-sized. On the real cluster this query IS the decision input
# for q_join_salted-style mitigation.


def q_skew_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row of key-frequency skew statistics for events.user_id."""
    spark = tune(spark)
    ev = load(spark, sf_dir, "events")
    freq = scoped_persist(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w_rank = Window.orderBy("cnt", "user_id")
    w_hot = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
    ranked = freq.select(
        "user_id",
        "cnt",
        F.row_number().over(w_rank).alias("rn"),
        F.row_number().over(w_hot).alias("hot_rn"),
    )
    base = freq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    picks = None
    for p_name, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        pick = (
            ranked.crossJoin(F.broadcast(base.select("n_keys")))
            .filter(
                F.col("rn")
                == F.expr(
                    f"cast(({num} * n_keys + {den - 1}) div {den} as int)"
                )
            )
            .select(F.col("cnt").alias(f"{p_name}_cnt"))
        )
        picks = pick if picks is None else picks.crossJoin(pick)
    hottest = ranked.filter(F.col("hot_rn") == 1).select(
        F.col("user_id").alias("top_key"), F.col("cnt").alias("top_cnt")
    )
    return (
        base.crossJoin(picks)
        .crossJoin(hottest)
        .withColumn(
            "skew_ratio_fp",
            F.expr("cast(1000000 * max_cnt * n_keys div total_rows as bigint)"),
        )
    )


# ceil(p*n) = (p*n + den-1) div den on NON-NEGATIVE ints — the
# q_percentile_exact idiom (a negative-numerator formulation would
# straddle Spark div-truncate vs DuckDB //-floor).
ORACLE_SKEW_DIAG = """
WITH freq AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
),
ranked AS (
  SELECT user_id, cnt,
         row_number() OVER (ORDER BY cnt, user_id) AS rn,
         row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS hot_rn
  FROM freq
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS total_rows,
         CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM freq
)
SELECT b.n_keys, b.total_rows, b.max_cnt,
       p50.cnt AS p50_cnt, p90.cnt AS p90_cnt, p99.cnt AS p99_cnt,
       hot.user_id AS top_key, hot.cnt AS top_cnt,
       CAST(1000000 * b.max_cnt * b.n_keys // b.total_rows AS BIGINT)
         AS skew_ratio_fp
FROM base b
CROSS JOIN (SELECT r.cnt FROM ranked r, base b
            WHERE r.rn = CAST((1 * b.n_keys + 1) // 2 AS INT)) p50
CROSS JOIN (SELECT r.cnt FROM ranked r, base b
            WHERE r.rn = CAST((9 * b.n_keys + 9) // 10 AS INT)) p90
CROSS JOIN (SELECT r.cnt FROM ranked r, base b
            WHERE r.rn = CAST((99 * b.n_keys + 99) // 100 AS INT)) p99
CROSS JOIN (SELECT user_id, cnt FROM ranked WHERE hot_rn = 1) hot
"""

QUERIES["q_skew_diag"] = (q_skew_diag, ORACLE_SKEW_DIAG)
