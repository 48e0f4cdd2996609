"""Pin the repo-wide fixed-point magnitude bound (ADVICE r12 items 1+3).

Two contracts:

1. **Literal sync** — the bound literal ``9.0e12`` is hard-coded at
   ~140 dialect-common SQL sites across the operator modules (it must
   be: the SQL text is embedded verbatim in oracle strings, so it
   cannot always be interpolated without rebuilding every oracle as an
   f-string). If ``FIXED_POINT_MAX_SQL`` is ever retuned in parity.py,
   every stale site must be flagged loudly — this test greps the
   source tree and asserts every bound-class literal equals the
   canonical one.

2. **Scale-aware guard** — ``rhu``/``fixed_str`` at scale 10**d must
   bound the INPUT so the scaled value ``floor(x * 10**d + 0.5)``
   stays inside int64 (ADVICE r12 item 1: a flat 9.0e12 guard at d=8
   admits inputs in [2**63/1e8 ~ 9.22e10, 9.0e12) whose scaled floor
   saturates Spark's LONG while DuckDB keeps an exact double — the
   silent asymmetric class the r12 `huge` probe established). The
   dual-engine slice below sits exactly in that band.
"""

from __future__ import annotations

import glob
import os
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from metoffice_spark.parity import (
    FIXED_POINT_MAX,
    FIXED_POINT_MAX_SQL,
    _bound,
    _bound_sql,
    fixed_str,
    fixed_str_sql,
    rhu,
    rhu_sql,
)

_ROOT = os.path.join(os.path.dirname(__file__), "..")

# Bound-class literal: mantissa-9-point-something times 10^(10..18) —
# wide enough to catch a stale copy after any plausible retune of the
# validity bound, narrow enough to skip unrelated constants (1e6
# scale factors, 9.2e18 int64-limit citations, fuzz magnitudes 1e17).
_BOUND_CLASS = re.compile(r"\b9\.0e1[0-8]\b")


def _source_files():
    pats = [
        os.path.join(_ROOT, "metoffice_spark", "**", "*.py"),
        os.path.join(_ROOT, "tools", "*.py"),
        os.path.join(_ROOT, "__spark_entry__.py"),
        os.path.join(_ROOT, "bench.py"),
    ]
    for pat in pats:
        yield from glob.glob(pat, recursive=True)


def test_bound_literal_in_sync_everywhere():
    assert float(FIXED_POINT_MAX_SQL) == FIXED_POINT_MAX
    stale = []
    for path in _source_files():
        if os.path.basename(path) == "parity.py":
            # canonical definition site (incl. the 9.0e18 headroom
            # arithmetic in the contract comment)
            continue
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                for lit in _BOUND_CLASS.findall(line):
                    if lit != FIXED_POINT_MAX_SQL:
                        stale.append(f"{os.path.relpath(path, _ROOT)}:{lineno}: {lit}")
    assert stale == [], (
        "bound-class literals out of sync with parity.FIXED_POINT_MAX_SQL "
        f"({FIXED_POINT_MAX_SQL}) — retune left these behind:\n" + "\n".join(stale)
    )


def test_vector_bound_literal_in_sync_everywhere():
    """Same contract as the 9.0e12 sync above, for the r13 dot-safe
    vector-component bound (llm.VEC_COMPONENT_MAX_SQL = '9.0e1'): it
    is spelled verbatim in q_dq_checks' embeddings detector and the
    multimodal checksum sites, so a retune must flag every stale
    copy. Single-digit-exponent 9.0eN literals are used for nothing
    else in the tree."""
    from metoffice_spark.operators.llm import VEC_COMPONENT_MAX_SQL

    vec_class = re.compile(r"\b9\.0e[0-9]\b")
    stale = []
    for path in _source_files():
        if os.path.basename(path) == "llm.py":
            continue  # canonical definition site
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                for lit in vec_class.findall(line):
                    if lit != VEC_COMPONENT_MAX_SQL:
                        stale.append(f"{os.path.relpath(path, _ROOT)}:{lineno}: {lit}")
    assert stale == [], (
        "vector-bound literals out of sync with llm.VEC_COMPONENT_MAX_SQL "
        f"({VEC_COMPONENT_MAX_SQL}):\n" + "\n".join(stale)
    )


def test_bound_is_scale_aware():
    # d <= 6: the flat bound, textually unchanged ('9.0e12' everywhere)
    for d in (0, 1, 2, 3, 4, 6):
        assert _bound_sql(d) == FIXED_POINT_MAX_SQL
    # beyond 6: one decade per digit, scaled value strictly inside int64
    assert _bound_sql(7) == "9.0e11"
    assert _bound_sql(8) == "9.0e10"
    for d in range(0, 9):
        assert _bound(d) * 10**d + 0.5 < 2**63


@pytest.mark.parametrize("x", [5.0e11, -5.0e11, 9.3e10])
def test_d8_band_nulls_on_both_engines(spark, x):
    """The exact ADVICE r12 band: passes the flat 9.0e12 guard, would
    saturate floor(x*1e8+0.5) on Spark. Both engines must now NULL."""
    con = duckdb.connect()
    for d, expect_null in ((8, True), (6, False)):
        xe = f"CAST({x!r} AS DOUBLE)"  # operator inputs are DOUBLE columns
        o_r = con.sql(f"SELECT {rhu_sql(xe, d)} AS v").fetchone()[0]
        o_s = con.sql(f"SELECT {fixed_str_sql(xe, d)} AS v").fetchone()[0]
        row = (
            spark.range(1)
            .select(
                rhu(F.lit(x), d).alias("r"),
                fixed_str(F.lit(x), d).alias("s"),
            )
            .first()
        )
        assert (o_r is None) == expect_null, (d, o_r)
        assert (o_s is None) == expect_null, (d, o_s)
        assert row["r"] == pytest.approx(o_r) if o_r is not None else row["r"] is None
        assert row["s"] == o_s
    # in-range value rounds identically at d=8 on both engines
    v = 1.234567891
    o = con.sql(f"SELECT {rhu_sql(f'CAST({v!r} AS DOUBLE)', 8)} AS v").fetchone()[0]
    got = spark.range(1).select(rhu(F.lit(v), 8).alias("r")).first()["r"]
    assert got == o == 1.23456789
