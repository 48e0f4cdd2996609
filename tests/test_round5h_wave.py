"""Semantic property tests for the round-5h warehouse wave: RFM
segmentation, event paths, dataset fingerprints."""

from __future__ import annotations

import hashlib
import math


def test_rfm_census_partitions_customers(spark, sf_smoke):
    """Segment census sums to the ordering-customer count; every
    segment's mean recency/freq/money recomputes from a direct
    Python RFM build."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.warehouse import q_rfm_segmentation

    rows = {r["segment"]: r for r in q_rfm_segmentation(spark, sf_smoke).collect()}
    orders = load(spark, sf_smoke, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    per: dict = {}
    for r in orders:
        d = r["o_orderdate"].date()
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        last, freq, money = per.get(r["o_custkey"], (d, 0, 0))
        per[r["o_custkey"]] = (max(last, d), freq + 1, money + cents)
    assert sum(r["n_customers"] for r in rows.values()) == len(per)
    obs = max(v[0] for v in per.values())

    def ntile5(keyed):  # list of (metric_key_tuple, custkey) pre-sorted
        n = len(keyed)
        out = {}
        base, extra = divmod(n, 5)
        idx = 0
        for b in range(1, 6):
            size = base + (1 if b <= extra else 0)
            for _ in range(size):
                out[keyed[idx]] = b
                idx += 1
        return out

    recs = {c: (obs - v[0]).days for c, v in per.items()}
    r_rank = ntile5(sorted(per, key=lambda c: (-recs[c], c)))
    f_rank = ntile5(sorted(per, key=lambda c: (per[c][1], c)))
    m_rank = ntile5(sorted(per, key=lambda c: (per[c][2], c)))
    agg: dict = {}
    for c in per:
        r, f, m = r_rank[c], f_rank[c], m_rank[c]
        if r >= 4 and f >= 4 and m >= 4:
            seg = "champion"
        elif r >= 4 and f <= 2:
            seg = "new"
        elif r <= 2 and f >= 4:
            seg = "at_risk"
        elif r <= 2 and f <= 2:
            seg = "hibernating"
        else:
            seg = "core"
        n, sr, sf_, sm = agg.get(seg, (0, 0, 0, 0))
        agg[seg] = (n + 1, sr + recs[c], sf_ + per[c][1], sm + per[c][2])
    assert set(rows) == set(agg)
    for seg, (n, sr, sf_, sm) in agg.items():
        assert rows[seg]["n_customers"] == n
        assert rows[seg]["avg_recency_fp"] == 1_000_000 * sr // n
        assert rows[seg]["avg_freq_fp"] == 1_000_000 * sf_ // n
        assert rows[seg]["avg_money_fp"] == 1_000_000 * sm // n


def test_event_paths_recount(spark, sf_smoke):
    """Path counts match a Python sliding-window recount over the
    per-user (ts, event_id)-ordered streams."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.warehouse import q_event_paths

    rows = q_event_paths(spark, sf_smoke).collect()
    assert rows
    ev = load(spark, sf_smoke, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    streams: dict = {}
    for r in ev:
        streams.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    counts: dict = {}
    for s in streams.values():
        s.sort()
        for i in range(len(s) - 2):
            p = f"{s[i][2]}>{s[i + 1][2]}>{s[i + 2][2]}"
            counts[p] = counts.get(p, 0) + 1
    for r in rows:
        assert r["n"] == counts[r["path"]]
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert {r["path"] for r in rows} == {p for p, _ in top}


def test_dataset_fingerprint_order_free_and_total(spark, sf_smoke):
    """The rollup total equals the shard sums (add) and xor of shard
    checksums; a probe shard matches a Python recount; permuting row
    order cannot change the result (commutative aggregates)."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.warehouse import (
        _FP_SHARDS,
        q_dataset_fingerprint,
    )

    rows = {r["shard"]: r for r in q_dataset_fingerprint(spark, sf_smoke).collect()}
    shard_rows = [r for s, r in rows.items() if s >= 0]
    total = rows[-1]
    assert total["n_rows"] == sum(r["n_rows"] for r in shard_rows)
    assert total["checksum_add"] == sum(r["checksum_add"] for r in shard_rows)
    xor = 0
    for r in shard_rows:
        xor ^= r["checksum_xor"]
    assert total["checksum_xor"] == xor
    docs = load(spark, sf_smoke, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    ).collect()
    add0, xor0, n0 = 0, 0, 0
    for d in docs:
        if d["doc_id"] % _FP_SHARDS != 0:
            continue
        h = hashlib.md5(
            f"{d['doc_id']}|{d['lang']}|{d['source']}|{d['n_chars']}".encode()
        ).hexdigest()
        add0 += int(h[:8], 16)
        xor0 ^= int(h[:12], 16)
        n0 += 1
    assert rows[0]["n_rows"] == n0
    assert rows[0]["checksum_add"] == add0
    assert rows[0]["checksum_xor"] == xor0


def test_agg_cube_lattice_consistency(spark, sf_smoke):
    """The four grouping levels reconcile: the grand total equals the
    sum of every fully-grouped cell, and each one-dimension margin
    re-aggregates its detail cells."""
    from metoffice_spark.operators.relational import q_agg_cube

    rows = q_agg_cube(spark, sf_smoke).collect()
    detail = [r for r in rows if not r["g_status"] and not r["g_priority"]]
    grand = [r for r in rows if r["g_status"] and r["g_priority"]]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in detail)
    assert grand[0]["total_cents"] == sum(r["total_cents"] for r in detail)
    for m in (r for r in rows if r["g_priority"] and not r["g_status"]):
        cells = [r for r in detail if r["o_orderstatus"] == m["o_orderstatus"]]
        assert m["n_orders"] == sum(r["n_orders"] for r in cells)
        assert m["total_cents"] == sum(r["total_cents"] for r in cells)


def test_fn_bitwise_recount(spark, sf_smoke):
    """Every bitwise column matches the Python operators exactly."""
    from metoffice_spark.operators.relational import q_fn_bitwise_suite

    rows = q_fn_bitwise_suite(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        k = r["o_orderkey"]
        assert r["b_and"] == k & 255
        assert r["b_or"] == k | 4096
        assert r["b_xor"] == k ^ 61680
        assert r["b_shl"] == (k & 1023) << 3
        assert r["b_shr"] == k >> 2
        assert r["b_pop"] == bin(k).count("1")
        assert r["b_notmask"] == ~k & 255
