"""Distributed linear algebra (SURVEY.md §2.22, round 5c):
power-iteration PCA over the embedding corpus.

The one iterative-linear-algebra representative of the ML stack: the
dominant principal direction of the embedding Gram matrix via two
power-iteration steps, every intermediate an exact BIGINT so the
trajectory is bitwise identical cross-engine (the q_graph_pagerank /
q_kmeans_train fixed-point discipline applied to matvecs).

Pipeline: fixed-point vectors (1e-6 BIGINT, llm.py `_ivec_*`) →
Gram accumulation G[i,j] = Σ_vec x_i·x_j ((i,j) partial aggregate
with map-side combine) → downscale (sign-split truncating div, the
q_semdedup_centroid idiom — Gram sums are signed) → two unrolled
matvec+renormalize rounds → 64 rows of the 1e3-scaled eigenvector
estimate plus a Rayleigh-quotient eigenvalue estimate (IEEE, last).

Overflow budget (int64 max ≈ 9.2e18): |x_fp| ≤ 1e6 ⇒ |G| ≤ n·1e12
(5e15 at sf0.1's 5e3 vectors); G' = G div 1e6 ≤ n·1e6; |v| ≤ 1e3 ⇒
|matvec| ≤ 64·n·1e9 (3.2e14 at sf0.1) — three orders of headroom,
and the d²·n explosion is bounded by d = 64 (at much larger d the
Gram accumulates per-partition via mapInPandas outer products
instead of an explode join; documented boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metoffice_spark.io import load
from metoffice_spark.operators.llm import _ivec_duck, _ivec_spark
from metoffice_spark.session import scoped_persist, tune

QUERIES: dict = {}

_PCA_ROUNDS = 2
# sign-split truncating division: |num| // den is non-negative (the
# engines agree), sign reapplied == truncate-toward-zero == Spark div.
def _tdiv_spark(num: str, den: str) -> str:
    return f"if({num} < 0, -((-({num})) div ({den})), ({num}) div ({den}))"


def _tdiv_duck(num: str, den: str) -> str:
    return (
        f"CASE WHEN {num} < 0 THEN -((-({num})) // ({den}))"
        f" ELSE ({num}) // ({den}) END"
    )


def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per dimension: the 1e3-scaled dominant-eigenvector estimate
    after two exact power-iteration rounds, with the IEEE Rayleigh
    eigenvalue estimate repeated on every row."""
    spark = tune(spark)
    xs = scoped_persist(
        load(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode(F.expr(_ivec_spark("embedding"))))
        .select("vec_id", F.col("pos").alias("i"), F.col("col").alias("xi"))
    )
    a = xs.select("vec_id", F.col("i").alias("gi"), F.col("xi").alias("xa"))
    b = xs.select("vec_id", F.col("i").alias("gj"), F.col("xi").alias("xb"))
    gram = scoped_persist(
        a.join(b, "vec_id")
        .groupBy("gi", "gj")
        .agg(F.sum(F.expr("xa * xb")).cast("bigint").alias("g"))
        .select(
            "gi", "gj", F.expr(_tdiv_spark("g", "1000000")).alias("gs")
        )
    )
    v = spark.range(64).select(
        F.col("id").cast("int").alias("j"), F.lit(1000).cast("bigint").alias("vj")
    )
    for _ in range(_PCA_ROUNDS):
        u = (
            gram.join(F.broadcast(v), gram["gj"] == v["j"])
            .groupBy(F.col("gi").alias("dim"))
            .agg(F.sum(F.expr("gs * vj")).cast("bigint").alias("u"))
        )
        mx = u.agg(F.max(F.abs(F.col("u"))).alias("mx"))
        v = (
            u.crossJoin(F.broadcast(mx))
            .select(
                F.col("dim").alias("j"),
                F.expr(_tdiv_spark("1000 * u", "greatest(mx, 1)"))
                .cast("bigint")
                .alias("vj"),
            )
        )
    # Rayleigh quotient lambda ~ (v.Gv)/(v.v) over the final v: exact
    # integer dot products, one IEEE divide last. Gv reuses the same
    # matvec; the 1e6 Gram downscale is undone in the estimate.
    gv = (
        gram.join(F.broadcast(v), gram["gj"] == v["j"])
        .groupBy(F.col("gi").alias("dim"))
        .agg(F.sum(F.expr("gs * vj")).cast("bigint").alias("gv"))
    )
    rayleigh = (
        gv.join(F.broadcast(v), gv["dim"] == v["j"])
        .agg(
            F.sum(F.expr("gv * vj")).cast("bigint").alias("num"),
            F.sum(F.expr("vj * vj")).cast("bigint").alias("den"),
        )
        .select(
            F.expr(
                "cast(num as double) * 1000000e0 / cast(greatest(den, 1) as double)"
            ).alias("eigval_est")
        )
    )
    return (
        v.select(F.col("j").alias("dim"), F.col("vj").alias("v_fp"))
        .crossJoin(F.broadcast(rayleigh))
    )


_XS_DUCK = f"""
xs AS (
  SELECT vec_id, CAST(i - 1 AS INT) AS i, v[i] AS xi
  FROM (SELECT vec_id, {_ivec_duck('embedding')} AS v FROM embeddings),
       unnest(range(1, 65)) AS t(i)
)
"""


def _pca_oracle() -> str:
    rounds = []
    prev = "v0"
    for r in range(1, _PCA_ROUNDS + 1):
        rounds.append(
            f"""u{r} AS (
  SELECT g.gi AS dim, CAST(sum(g.gs * p.vj) AS BIGINT) AS u
  FROM gram g JOIN {prev} p ON g.gj = p.j GROUP BY g.gi
),
v{r} AS (
  SELECT dim AS j,
         CAST({_tdiv_duck('1000 * u', '(SELECT greatest(max(abs(u)), 1) FROM u' + str(r) + ')')} AS BIGINT) AS vj
  FROM u{r}
)"""
        )
        prev = f"v{r}"
    body = ",\n".join(rounds)
    return f"""
WITH {_XS_DUCK.strip()},
gram AS (
  SELECT a.i AS gi, b.i AS gj,
         {_tdiv_duck('CAST(sum(a.xi * b.xi) AS BIGINT)', '1000000')} AS gs
  FROM xs a JOIN xs b USING (vec_id)
  GROUP BY a.i, b.i
),
v0 AS (
  SELECT CAST(unnest(range(64)) AS INT) AS j, CAST(1000 AS BIGINT) AS vj
),
{body},
gv AS (
  SELECT g.gi AS dim, CAST(sum(g.gs * p.vj) AS BIGINT) AS gv
  FROM gram g JOIN {prev} p ON g.gj = p.j GROUP BY g.gi
),
ray AS (
  SELECT cast(CAST(sum(gv.gv * p.vj) AS BIGINT) as double) * 1000000e0
           / cast(greatest(CAST(sum(p.vj * p.vj) AS BIGINT), 1) as double)
           AS eigval_est
  FROM gv JOIN {prev} p ON gv.dim = p.j
)
SELECT p.j AS dim, p.vj AS v_fp, r.eigval_est
FROM {prev} p CROSS JOIN ray r
"""


QUERIES["q_pca_power"] = (q_pca_power, _pca_oracle())
