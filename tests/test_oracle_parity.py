"""Run the full registry against the DuckDB oracle — the same check
the driver applies (rowcount + schema + order-insensitive values) —
at sf0.001 for speed. ``tools/check_parity.py sf0.01`` is the full
pre-flight."""

from __future__ import annotations

import pytest

from metoffice_spark.oracle_check import compare, connect_oracle
from metoffice_spark.registry import _collect

REG = _collect()


@pytest.fixture(scope="module")
def oracle(sf_smoke):
    con = connect_oracle(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(REG))
def test_parity(qid, spark, oracle, sf_smoke):
    fn, sql = REG[qid]
    if sql is None:
        assert fn(spark, sf_smoke).count() >= 0
        return
    problems = compare(spark, oracle, fn, sql, sf_smoke)
    assert not problems, f"{qid}: " + "; ".join(problems[:3])


def test_registry_integrity():
    """A broken operator-module import must shrink this count and fail
    here, never silently pass the gate over a subset (ADVICE r02); and
    the driver-facing registration order must start with _PRIORITY."""
    from metoffice_spark.registry import _PRIORITY

    assert len(REG) >= 95
    assert list(REG)[: len(_PRIORITY)] == list(_PRIORITY)


def test_no_arrow_divergent_oracle_types(oracle):
    """No oracle text may emit HUGEINT/DECIMAL output columns: DuckDB
    promotes sum(BIGINT) to int128, which hashes differently from
    Spark's int64 once the driver routes results through Arrow (the
    round-2 q_rollup_hypertable red). Cheap: plans only, no execution."""
    bad = {}
    for qid, (_, sql) in REG.items():
        if sql is None:
            continue
        rel = oracle.sql(sql)
        cols = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).lower() in ("hugeint", "uhugeint") or "decimal" in str(t).lower()
        ]
        if cols:
            bad[qid] = cols
    assert not bad, f"Arrow-divergent oracle columns: {bad}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "body" in df.columns
