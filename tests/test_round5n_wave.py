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
