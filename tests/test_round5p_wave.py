"""Semantic property tests for the round-5p wave: Lorenz curve, ABC
classes, HHI concentration, streaming prequential anomaly."""

from __future__ import annotations

import math


def test_lorenz_curve_monotone_convex(spark, sf_smoke):
    """Ten deciles; cumulative share is increasing, ends at ~1e6, and
    the curve is convex (later deciles add more revenue); decile
    populations are balanced to within one customer."""
    from metoffice_spark.operators.warehouse import q_lorenz_curve

    rows = sorted(q_lorenz_curve(spark, sf_smoke).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_custs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    shares = [r["cum_share_fp"] for r in rows]
    assert shares == sorted(shares)
    assert 999_990 <= shares[-1] <= 1_000_000
    revs = [r["rev_cents"] for r in rows]
    assert revs == sorted(revs)  # ascending-spend deciles
    assert rows[-1]["cum_cents"] == sum(revs)


def test_abc_classes_partition_and_order(spark, sf_smoke):
    """A/B/C partition all parts; shares sum to ~1; A has the fewest
    parts but the largest revenue (Pareto shape)."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.warehouse import q_abc_classification

    rows = {r["abc"]: r for r in q_abc_classification(spark, sf_smoke).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_parts = (
        load(spark, sf_smoke, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows.values()) == n_parts
    assert 999_990 <= sum(r["share_fp"] for r in rows.values()) <= 1_000_000
    assert rows["A"]["rev_cents"] > rows["C"]["rev_cents"]


def test_hhi_bounds_and_recount(spark, sf_smoke):
    """HHI in (0, 1e6]; recompute one nation from raw orders."""
    from collections import defaultdict

    from metoffice_spark.io import load
    from metoffice_spark.operators.warehouse import q_hhi_concentration

    rows = q_hhi_concentration(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        # strictly positive while every nation has < ~1e6 comparable
        # customers (the documented ppm-resolution bound)
        assert 0 < r["hhi_fp"] <= 1_000_000
    probe = rows[0]
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load(spark, sf_smoke, "customer").collect()
    }
    spend: dict = defaultdict(int)
    for r in load(spark, sf_smoke, "orders").collect():
        if cust.get(r["o_custkey"]) == probe["nat"]:
            spend[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100 + 0.5)
    s_tot = sum(spend.values())
    assert probe["spend_cents"] == s_tot and probe["n_custs"] == len(spend)

    def ppm(num: int, den: int) -> int:
        # the two-stage _fp_div_1e6 refine, re-derived locally
        q1 = (num * 1000) // den
        rem = num * 1000 - q1 * den
        return 1000 * q1 + (rem * 1000) // den

    hhi = sum(ppm(s, s_tot) ** 2 for s in spend.values()) // 1_000_000
    assert probe["hhi_fp"] == hhi


def test_stream_anomaly_prequential_and_stateful(spark, sf_smoke):
    """Streaming z-scores equal the batch lagged-window recount —
    including rows in the second micro-batch (state survived); the
    first two rows per station are NULL (prequential warm-up)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metoffice_spark.obs import observations
    from metoffice_spark.operators.streaming_batch import q_stream_anomaly

    streamed = {
        (r["station_id"], r["obs_id"]): (r["n_prior"], r["z"], r["is_anomaly"])
        for r in q_stream_anomaly(spark, sf_smoke).collect()
    }
    obs = observations(spark, sf_smoke).select(
        "station_id",
        "obs_id",
        "ts",
        F.floor(F.col("tempc") * 100 + F.lit(0.5)).cast("bigint").alias("vfp"),
    )
    w = (
        Window.partitionBy("station_id")
        .orderBy("ts", "obs_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = obs.select(
        "station_id",
        "obs_id",
        "vfp",
        F.coalesce(F.count("vfp").over(w), F.lit(0)).cast("bigint").alias("n"),
        F.coalesce(F.sum("vfp").over(w), F.lit(0)).cast("bigint").alias("s1"),
        F.coalesce(F.sum(F.col("vfp") * F.col("vfp")).over(w), F.lit(0))
        .cast("bigint")
        .alias("s2"),
    ).collect()
    assert len(batch) == len(streamed) and batch
    n_defined = 0
    for r in batch:
        key = (r["station_id"], r["obs_id"])
        n, s1, s2, vfp = r["n"], r["s1"], r["s2"], r["vfp"]
        got_n, got_z, got_flag = streamed[key]
        assert got_n == n
        if n >= 2 and n * s2 - s1 * s1 > 0:
            mean = s1 / n
            z = (vfp - mean) / math.sqrt(s2 / n - mean * mean)
            assert got_z == z  # bitwise: same IEEE shape both sides
            assert got_flag == (1 if abs(z) > 3.0 else 0)
            n_defined += 1
        else:
            assert got_z is None and got_flag is None
    assert n_defined > 0
