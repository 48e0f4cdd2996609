"""Semantic recount tests for the TPC-H completion wave (olap2.py).
Bitwise parity vs DuckDB runs in test_oracle_parity.py (identical-
text SQL); these assert the shapes' semantic invariants directly."""

from __future__ import annotations

import math

from metoffice_spark.io import load


def test_q2_min_property(spark, sf_smoke):
    """Every returned supplier's balance is the true min over the
    EUROPE suppliers that shipped that part."""
    from metoffice_spark.operators.olap2 import QUERIES

    rows = QUERIES["q_olap_min_cost_supp"][0](spark, sf_smoke).collect()
    assert rows
    nat = {r["n_nationkey"]: r["n_regionkey"] for r in load(spark, sf_smoke, "nation").collect()}
    reg = {r["r_regionkey"]: r["r_name"] for r in load(spark, sf_smoke, "region").collect()}
    supp = {
        r["s_suppkey"]: (r["s_acctbal"], reg[nat[r["s_nationkey"]]])
        for r in load(spark, sf_smoke, "supplier").collect()
    }
    ps: dict = {}
    for r in load(spark, sf_smoke, "lineitem").select("l_partkey", "l_suppkey").distinct().collect():
        ps.setdefault(r["l_partkey"], set()).add(r["l_suppkey"])
    for r in rows[:10]:
        eu = [supp[s][0] for s in ps[r["p_partkey"]] if supp[s][1] == "EUROPE"]
        assert r["s_acctbal"] == min(eu)


def test_q6_recount(spark, sf_smoke):
    """Revenue matches a Python recount of the filtered lines."""
    from metoffice_spark.operators.olap2 import QUERIES
    import datetime

    row = QUERIES["q_olap_revenue_delta"][0](spark, sf_smoke).collect()[0]
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    n = 0
    cents = 0
    for r in load(spark, sf_smoke, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    ).collect():
        if (
            lo <= r["l_shipdate"] < hi
            and 0.05 <= r["l_discount"] <= 0.07
            and r["l_quantity"] < 24.0
        ):
            n += 1
            cents += math.floor(r["l_extendedprice"] * r["l_discount"] * 100.0 + 0.5)
    assert row["n_lines"] == n
    assert row["revenue_cents"] == cents


def test_q12_partitions_all_lines(spark, sf_smoke):
    """fast + slow line counts partition the joined fact exactly."""
    from metoffice_spark.operators.olap2 import QUERIES

    rows = {r["latency"]: r for r in QUERIES["q_olap_ship_latency"][0](spark, sf_smoke).collect()}
    n_lines = load(spark, sf_smoke, "lineitem").count()
    total = sum(r["high_line_count"] + r["low_line_count"] for r in rows.values())
    assert total == n_lines
    assert set(rows) <= {"fast", "slow"}


def test_q13_histogram_covers_customers(spark, sf_smoke):
    """The order-count histogram sums to the customer count and has a
    zero bucket (some customers order nothing or only urgent)."""
    from metoffice_spark.operators.olap2 import QUERIES

    rows = QUERIES["q_olap_cust_distribution"][0](spark, sf_smoke).collect()
    n_cust = load(spark, sf_smoke, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust
    counts = {r["c_count"] for r in rows}
    assert all(c >= 0 for c in counts)


def test_q14_share_consistent(spark, sf_smoke):
    """promo <= total and the share recomputes from the cent sums."""
    from metoffice_spark.operators.olap2 import QUERIES

    row = QUERIES["q_olap_promo_share"][0](spark, sf_smoke).collect()[0]
    assert 0 <= row["promo_cents"] <= row["total_cents"]
    expected = 100.0 * float(row["promo_cents"]) / float(row["total_cents"])
    assert math.isclose(row["promo_share"], expected, rel_tol=1e-12)


def test_q21_sole_late_supplier(spark, sf_smoke):
    """Each counted (supplier, order) probe really is the ONLY late
    supplier on a multi-supplier finished order."""
    from metoffice_spark.operators.olap2 import QUERIES
    import datetime

    rows = QUERIES["q_olap_waiting_supplier"][0](spark, sf_smoke).collect()
    assert rows
    orders = {
        r["o_orderkey"]: (r["o_orderdate"], r["o_orderstatus"])
        for r in load(spark, sf_smoke, "orders").collect()
    }
    lines: dict = {}
    for r in load(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).collect():
        lines.setdefault(r["l_orderkey"], []).append((r["l_suppkey"], r["l_shipdate"]))
    supp_nat = {
        r["s_suppkey"]: (r["s_name"], r["s_nationkey"])
        for r in load(spark, sf_smoke, "supplier").collect()
    }
    expected: dict = {}
    for ok, (odate, status) in orders.items():
        if status != "F" or ok not in lines:
            continue
        cutoff = odate + datetime.timedelta(days=90)
        ls = lines[ok]
        late_supps = {s for s, sd in ls if sd > cutoff}
        all_supps = {s for s, _ in ls}
        for s, sd in ls:
            if (
                sd > cutoff
                and len(all_supps - {s}) > 0
                and late_supps == {s}
                and supp_nat[s][1] < 13
            ):
                expected[supp_nat[s][0]] = expected.get(supp_nat[s][0], 0) + 1
    got = {r["s_name"]: r["numwait"] for r in rows}
    top = dict(
        sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    )
    assert got == top
