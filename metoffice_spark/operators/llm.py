"""LLM-data-pipeline operators: dedup + similarity search + multimodal
(SURVEY.md §2.11 + q_dedup_exact; BASELINE.json north star).

The reference has no analog for these (pure EXT per SURVEY §2.11) —
they are the operators a 100 TB training-data pipeline needs over the
``documents`` / ``embeddings`` driver tables.

Cross-engine determinism rules used throughout (the oracle gate
compares doubles bitwise):

- **Integer fixed-point vectors**: every embedding component becomes
  ``floor(x * 1e6 + 0.5)`` as BIGINT. Integer sums are exact and
  order-free (no float-summation-order hazard between Spark's partial
  aggregation and DuckDB's), and the final ``dot / (sqrt(n2a) *
  sqrt(n2b))`` is a fixed sequence of correctly-rounded IEEE ops on
  exact integer inputs — bit-identical in both engines.
- **md5-hex minhashing**: "random" hash families are
  ``md5(seed || '|' || shingle)`` — deterministic, identical text in
  both dialects, uniformly distributed.
- **No float group-aggregates**: any SUM that feeds output goes over
  BIGINT.

Scale design (100 TB):
- exact dedup shuffles a 64-hex digest + doc_id, never the document
  text (q_dedup_exact);
- near-dup detection is MinHash + LSH banding: candidates are pairs
  sharing a band bucket (shuffle keyed on bucket), never all-pairs;
  verification runs only on candidates via an inverted-index join on
  distinct shingles (q_dedup_fuzzy);
- similarity search broadcasts the (small) query set and computes
  cosine JVM-side with ``zip_with``/``aggregate`` — no Python in the
  hot path; the LSH/IVF variants in this module bucket the corpus so
  the scan per query is a cluster, not the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metoffice_spark.io import load
from metoffice_spark.session import tune

# --- shared dialect snippets ------------------------------------------------

# Text normalization (whitespace collapse + case fold + trim).
NORM_SPARK = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
NORM_DUCK = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

# Tokens: lowercase alnum runs, empties dropped.
TOKS_SPARK = "filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')"
TOKS_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"


def _ivec_spark(col: str) -> str:
    """array<float> -> array<bigint> fixed-point at 1e-6 (Spark SQL)."""
    return (
        f"transform({col}, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5)"
        " as bigint))"
    )


def _ivec_duck(col: str) -> str:
    return (
        f"list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)"
        " AS BIGINT))"
    )


NORM2_SPARK = "aggregate({v}, cast(0 as bigint), (a, x) -> a + x * x)"
NORM2_DUCK = "list_aggregate(list_transform({v}, x -> x * x), 'sum')"

DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint),"
    " (acc, p) -> acc + p)"
)
DOT_DUCK = (
    "list_aggregate(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]),"
    " 'sum')"
)


def _cos_spark(a: str, b: str, n2a: str, n2b: str) -> str:
    dot = DOT_SPARK.format(a=a, b=b)
    return (
        f"cast({dot} as double) / (sqrt(cast({n2a} as double))"
        f" * sqrt(cast({n2b} as double)))"
    )


def _cos_duck(a: str, b: str, n2a: str, n2b: str) -> str:
    dot = DOT_DUCK.format(a=a, b=b)
    return (
        f"CAST({dot} AS DOUBLE) / (sqrt(CAST({n2a} AS DOUBLE))"
        f" * sqrt(CAST({n2b} AS DOUBLE)))"
    )


# --- q_dedup_exact ----------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on a digest of the *normalized* text.

    Scale: the shuffle key is sha256 hex (64 bytes), not the document
    body — at 100 TB the exchange moves digests + ids only. Keep-first
    = min(doc_id) per group (deterministic winner)."""
    docs = load(tune(spark), sf_dir, "documents")
    keyed = docs.select(
        F.sha2(F.expr(NORM_SPARK), 256).alias("k"), "doc_id"
    )
    return (
        keyed.groupBy("k")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("dup_count"))
        .select("doc_id", "dup_count")
    )


ORACLE_DEDUP_EXACT = f"""
SELECT min(doc_id) AS doc_id, count(*) AS dup_count
FROM (SELECT doc_id, sha256({NORM_DUCK}) AS k FROM documents)
GROUP BY k
"""


# --- q_dedup_fuzzy: MinHash + LSH banding -----------------------------------
#
# Word-3-shingles -> 12 minhashes (md5 family) -> 4 bands x 3 rows ->
# candidate pairs share a band bucket -> verify true Jaccard on the
# candidates only, via an inverted-index join on distinct shingles.
#
# The driver corpus has no near-duplicates (500/500 distinct), so the
# query plants them deterministically IN-QUERY (identically in both
# engines): every doc_id % 25 == 0 gains a variant copy with a short
# suffix appended — Jaccard ~0.9 against its original.

_N_MINHASH = 12
_BAND_ROWS = 3  # 4 bands x 3 rows

_PLANT_SUFFIX = " planted near duplicate suffix"

_SHINGLES_SPARK = (
    "transform(sequence(1, size(toks) - 2),"
    " i -> concat(element_at(toks, cast(i as int)), ' ',"
    " element_at(toks, cast(i + 1 as int)), ' ',"
    " element_at(toks, cast(i + 2 as int))))"
)
_SHINGLES_DUCK = (
    "list_transform(range(1, len(toks) - 1),"
    " i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])"
)


def _mh_spark(j: int) -> str:
    return f"array_min(transform(sh, s -> md5(concat('{j}|', s))))"


def _mh_duck(j: int) -> str:
    return f"list_aggregate(list_transform(sh, s -> md5('{j}|' || s)), 'min')"


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(tune(spark), sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_PLANT_SUFFIX)).alias("text"),
    )
    return docs.unionByName(planted)


_CORPUS_DUCK = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text || '{_PLANT_SUFFIX}' AS text
  FROM documents WHERE doc_id % 25 = 0
)
"""


def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification.

    Plan shape at scale: shuffle once on band buckets (candidate
    generation), once on shingles restricted to candidate docs
    (verification) — never an all-pairs product."""
    corpus = _corpus(spark, sf_dir)
    shingled = (
        corpus.select("doc_id", F.expr(TOKS_SPARK).alias("toks"))
        .filter(F.expr("size(toks) >= 3"))
        .select("doc_id", F.expr(_SHINGLES_SPARK).alias("sh"))
    )
    mh_cols = [F.expr(_mh_spark(j)).alias(f"mh{j}") for j in range(_N_MINHASH)]
    sigs = shingled.select("doc_id", "sh", *mh_cols)
    band_exprs = [
        F.md5(
            F.concat_ws(
                "#", *[f"mh{b * _BAND_ROWS + r}" for r in range(_BAND_ROWS)]
            )
        ).alias(f"band{b}")
        for b in range(_N_MINHASH // _BAND_ROWS)
    ]
    banded = sigs.select("doc_id", *band_exprs)
    buckets = banded.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"band{b}") for b in range(_N_MINHASH // _BAND_ROWS)])
        ).alias("band_id", "bucket"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # Verification: inverted-index join on distinct shingles, restricted
    # to candidate docs (semi-join), then exact Jaccard per candidate pair.
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select("doc_b"))
        .distinct()
    )
    sh_ex = (
        shingled.join(cand_docs, "doc_id", "left_semi")
        .select("doc_id", F.explode(F.array_distinct("sh")).alias("s"))
    )
    sizes = sh_ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    xa, xb = sh_ex.alias("xa"), sh_ex.alias("xb")
    inter = (
        xa.join(
            xb,
            (F.col("xa.s") == F.col("xb.s"))
            & (F.col("xa.doc_id") < F.col("xb.doc_id")),
        )
        .select(F.col("xa.doc_id").alias("doc_a"), F.col("xb.doc_id").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
        .join(pairs, ["doc_a", "doc_b"])
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    out = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("c").cast("double")
            / (F.col("na") + F.col("nb") - F.col("c")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.6)
    )
    return out.select("doc_a", "doc_b", "jaccard")


def _fuzzy_oracle() -> str:
    mh_sql = ",\n         ".join(
        f"{_mh_duck(j)} AS mh{j}" for j in range(_N_MINHASH)
    )
    band_sql = ",\n         ".join(
        "md5(concat_ws('#', "
        + ", ".join(f"mh{b * _BAND_ROWS + r}" for r in range(_BAND_ROWS))
        + f")) AS band{b}"
        for b in range(_N_MINHASH // _BAND_ROWS)
    )
    band_union = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS bucket FROM bands"
        for b in range(_N_MINHASH // _BAND_ROWS)
    )
    return f"""
WITH {_CORPUS_DUCK.strip()},
shingled AS (
  SELECT doc_id, {_SHINGLES_DUCK} AS sh
  FROM (SELECT doc_id, {TOKS_DUCK} AS toks FROM corpus)
  WHERE len(toks) >= 3
),
sigs AS (
  SELECT doc_id, sh,
         {mh_sql}
  FROM shingled
),
bands AS (
  SELECT doc_id,
         {band_sql}
  FROM sigs
),
buckets AS (
  {band_union}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
cand AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs)
),
sh_ex AS (
  SELECT s.doc_id, unnest(list_distinct(s.sh)) AS s
  FROM shingled s JOIN cand c ON s.doc_id = c.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh_ex GROUP BY doc_id),
inter AS (
  SELECT xa.doc_id AS doc_a, xb.doc_id AS doc_b, count(*) AS c
  FROM sh_ex xa JOIN sh_ex xb ON xa.s = xb.s AND xa.doc_id < xb.doc_id
  JOIN pairs p ON p.doc_a = xa.doc_id AND p.doc_b = xb.doc_id
  GROUP BY xa.doc_id, xb.doc_id
)
SELECT i.doc_a, i.doc_b,
       CAST(i.c AS DOUBLE) / CAST(na.n + nb.n - i.c AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE CAST(i.c AS DOUBLE) / CAST(na.n + nb.n - i.c AS DOUBLE) >= 0.6
"""


ORACLE_DEDUP_FUZZY = _fuzzy_oracle()


# --- q_sim_search: brute-force cosine top-k ---------------------------------

def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k=5 per query vector (queries = vec_id < 8).

    The query side is broadcast (tiny), the corpus side streams —
    one pass over the corpus, no shuffle of embeddings. All arithmetic
    is JVM-side ``zip_with``/``aggregate`` over fixed-point BIGINTs.
    Scale path beyond brute force = q_sim_search_ivf."""
    emb = load(tune(spark), sf_dir, "embeddings")
    base = emb.select(
        "vec_id", F.expr(_ivec_spark("embedding")).alias("v")
    ).withColumn("n2", F.expr(NORM2_SPARK.format(v="v")))
    q = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("n2").alias("qn2")
    )
    c = base.filter(F.col("vec_id") >= 8)
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        F.expr(_cos_spark("qv", "v", "qn2", "n2")).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "vec_id", "cos_sim", "rnk")
    )


ORACLE_SIM_SEARCH = f"""
WITH base AS (
  SELECT vec_id, {_ivec_duck('embedding')} AS v FROM embeddings
),
b2 AS (
  SELECT vec_id, v, {NORM2_DUCK.format(v='v')} AS n2 FROM base
),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
         {_cos_duck('q.v', 'c.v', 'q.n2', 'c.n2')} AS cos_sim
  FROM b2 q JOIN b2 c ON q.vec_id < 8 AND c.vec_id >= 8
)
SELECT q_id, vec_id, cos_sim, CAST(rn AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
  FROM scored)
WHERE rn <= 5
"""


# --- q_multimodal_cols: opaque binary payload + typed metadata ---------------

def q_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: an opaque ``binary`` payload plus a
    typed metadata struct carried through filter -> join -> agg, with
    array-typed embeddings reduced to hashable scalars at the end.

    At 100 TB the payload column is image/audio bytes; everything here
    (struct-field filter, equi-join, byte-length sums, digests) stays
    JVM-side and column-pruned — the binary column is only read where
    actually referenced."""
    docs = load(tune(spark), sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    assets = docs.select(
        "doc_id",
        "lang",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("n_chars"), F.col("source").alias("src")
        ).alias("meta"),
    )
    big = assets.filter(F.col("meta.n_chars") > 200)
    joined = big.join(emb, big.doc_id == emb.vec_id)
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum(F.length("payload").cast("bigint")).alias("total_bytes"),
            F.min(F.md5("payload")).alias("min_digest"),
            F.sum(
                F.expr(
                    "cast(floor(cast(element_at(embedding, 1) as double)"
                    " * 1000000.0 + 0.5) as bigint)"
                )
            ).alias("emb0_fp_sum"),
        )
        .select("lang", "n_assets", "total_bytes", "min_digest", "emb0_fp_sum")
    )


ORACLE_MULTIMODAL_COLS = """
SELECT d.lang,
       count(*) AS n_assets,
       sum(octet_length(CAST(d.text AS BLOB))) AS total_bytes,
       min(md5(d.text)) AS min_digest,
       sum(CAST(floor(CAST(e.embedding[1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
         AS emb0_fp_sum
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
WHERE d.n_chars > 200
GROUP BY d.lang
"""


QUERIES = {
    "q_dedup_exact": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    "q_dedup_fuzzy": (q_dedup_fuzzy, ORACLE_DEDUP_FUZZY),
    "q_sim_search": (q_sim_search, ORACLE_SIM_SEARCH),
    "q_multimodal_cols": (q_multimodal_cols, ORACLE_MULTIMODAL_COLS),
}
