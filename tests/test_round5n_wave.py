"""Semantic property tests for the round-5n pair: temporal split
with embargo, group-mean null imputation."""

from __future__ import annotations

import math


def test_split_temporal_partitions_and_embargo(spark, sf_smoke):
    """Train covers >= 80 % of rows and ends at the cutoff; embargo
    spans at most one day after it; test starts strictly after the
    embargo; every event lands in exactly one split."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.prep import _EMBARGO_S, q_split_temporal

    rows = {r["split"]: r for r in q_split_temporal(spark, sf_smoke).collect()}
    n_events = load(spark, sf_smoke, "events").count()
    assert sum(r["n_rows"] for r in rows.values()) == n_events
    assert "train" in rows
    assert rows["train"]["n_rows"] * 5 >= n_events * 4
    cut = rows["train"]["es_max"]
    if "embargo" in rows:
        assert cut < rows["embargo"]["es_min"]
        assert rows["embargo"]["es_max"] <= cut + _EMBARGO_S
    if "test" in rows:
        assert rows["test"]["es_min"] > cut + _EMBARGO_S


def test_null_imputation_audit(spark, sf_smoke):
    """Counts add up, imputed rows get the nation mean (recount for
    one nation), filled means shift toward the observed mean."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.prep import q_null_imputation

    rows = q_null_imputation(spark, sf_smoke).collect()
    n_cust = load(spark, sf_smoke, "customer").count()
    assert sum(r["n_obs"] + r["n_imputed"] for r in rows) == n_cust
    probe = max(rows, key=lambda r: r["n_imputed"])
    cust = load(spark, sf_smoke, "customer").filter(
        f"c_nationkey = {probe['nat']}"
    ).select("c_custkey", "c_acctbal").collect()
    import hashlib

    obs_sum = obs_n = 0
    masked_n = 0
    for r in cust:
        cents = math.floor(r["c_acctbal"] * 100 + 0.5)
        nib = hashlib.md5(f"IMP1|{r['c_custkey']}".encode()).hexdigest()[0]
        if nib in "01":
            masked_n += 1
        else:
            obs_sum += cents
            obs_n += 1
    assert probe["n_obs"] == obs_n and probe["n_imputed"] == masked_n
    if obs_n:
        mean = obs_sum // obs_n if obs_sum >= 0 else -((-obs_sum) // obs_n)
        assert probe["s_filled"] == obs_sum + masked_n * mean
        assert probe["n_filled"] == obs_n + masked_n


def test_rolling_regression_recount_one_user(spark, sf_smoke):
    """Recompute the trailing-8 slope for one user's last event in
    plain Python; windows below 3 points yield NULL."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.mining import _ROLL_N, q_rolling_regression

    rows = q_rolling_regression(spark, sf_smoke).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    uid, urows = max(by_user.items(), key=lambda kv: len(kv[1]))
    ev = sorted(
        (
            (int(r["ts"].timestamp()), math.floor(r["value"] * 100 + 0.5), r["event_id"])
            for r in load(spark, sf_smoke, "events")
            .filter(f"user_id = {uid}")
            .select("ts", "value", "event_id")
            .collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    base = ev[0][0]
    pts = [(es - base, y, eid) for es, y, eid in ev]
    by_eid = {r["event_id"]: r for r in urows}
    for i, (_, _, eid) in enumerate(pts):
        win = pts[max(0, i - _ROLL_N + 1): i + 1]
        n = len(win)
        r = by_eid[eid]
        assert r["n"] == n
        sx = sum(x for x, _, _ in win)
        sy = sum(y for _, y, _ in win)
        sxx = sum(x * x for x, _, _ in win)
        sxy = sum(x * y for x, y, _ in win)
        det = n * sxx - sx * sx
        if n >= 3 and det > 0:
            expect = (n * sxy - sx * sy) / det
            assert math.isclose(r["slope"], expect, rel_tol=1e-12)
        else:
            assert r["slope"] is None


def test_stream_twap_state_survives_batch_split(spark, sf_smoke):
    """The streaming running-TWAP must match the batch cumulative
    trapezoid EXACTLY — including at the first rows of the second
    micro-batch, which are correct only if (first_es, prev_es,
    prev_vfp, num, n) survived the checkpoint."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metoffice_spark.obs import observations
    from metoffice_spark.operators.streaming_batch import q_stream_twap

    streamed = {
        (r["station_id"], r["obs_id"]): (r["n_obs"], r["span_s"], r["twap_fp"])
        for r in q_stream_twap(spark, sf_smoke).collect()
    }
    obs = observations(spark, sf_smoke).select(
        "station_id",
        "obs_id",
        "ts",
        F.col("ts").cast("long").alias("es"),
        F.floor(F.col("tempc") * 100 + F.lit(0.5)).cast("bigint").alias("vfp"),
    )
    # order by RAW ts like the machine — not the floored second
    w = Window.partitionBy("station_id").orderBy("ts", "obs_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    batch = obs.select(
        "station_id",
        "obs_id",
        F.row_number().over(w).cast("bigint").alias("n_obs"),
        (F.col("es") - F.first("es").over(w)).cast("bigint").alias("span_s"),
        F.sum(
            F.coalesce(
                (F.lag("vfp").over(w) + F.col("vfp"))
                * (F.col("es") - F.lag("es").over(w)),
                F.lit(0),
            )
        )
        .over(w_cum)
        .cast("bigint")
        .alias("num"),
    ).collect()
    assert len(batch) == len(streamed) and batch
    for r in batch:
        n, span, num = r["n_obs"], r["span_s"], r["num"]
        if span > 0:
            mag = num if num >= 0 else -num
            twap = mag // (2 * span)
            twap = twap if num >= 0 else -twap
        else:
            twap = None
        assert streamed[(r["station_id"], r["obs_id"])] == (n, span, twap)
