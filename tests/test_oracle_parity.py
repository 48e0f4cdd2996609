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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "body" in df.columns
