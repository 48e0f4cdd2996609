"""Property-based tests (hypothesis) for the cross-engine parity
helpers. These run against DuckDB (no JVM startup per example); the
oracle-parity suite already proves the Spark expressions produce
identical values for the same SQL text."""

from __future__ import annotations

import math
import re
import urllib.parse

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from metoffice_spark.parity import fixed_str_sql, form_enc_sql, rhu_sql


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


# characters the WOW payload fields can carry, plus every reserved char
# the encoder must handle
_FORM_CHARS = st.text(
    alphabet="abcXYZ019 :&=%+-._", min_size=0, max_size=24
)


@settings(max_examples=200, deadline=None)
@given(_FORM_CHARS)
def test_form_enc_round_trips_through_parse_qsl(con, v):
    """Decoding the encoded body must recover the original value —
    the property the round-1 space/colon-only encoder violated."""
    enc = con.execute("SELECT " + form_enc_sql("?"), [v]).fetchone()[0]
    parsed = urllib.parse.parse_qsl(f"k={enc}", keep_blank_values=True)
    assert parsed == [("k", v)]


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=3),
)
def test_fixed_str_shape_and_accuracy(con, x, d):
    """fixed_str is the toFixed analog: d-decimal string within half an
    ulp-of-d of the input, correct sign, no '-0...0' output."""
    sql = "SELECT " + fixed_str_sql("?", d)
    s = con.execute(sql, [x] * sql.count("?")).fetchone()[0]
    pat = r"-?\d+\.\d{%d}$" % d if d else r"-?\d+$"
    assert re.fullmatch(pat, s), s
    assert abs(float(s) - x) <= 0.5 * 10 ** (-d) + 1e-9
    if s.startswith("-"):
        assert float(s) != 0.0 or x < 0  # never an all-zero negative


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False),
    st.integers(min_value=0, max_value=6),
)
def test_rhu_matches_python_ieee(con, x, d):
    """rhu is defined as floor(x*10^d + 0.5)/10^d on IEEE doubles; the
    DuckDB evaluation must equal the identical Python float program —
    the determinism that makes cross-engine hash comparison possible."""
    sql = "SELECT " + rhu_sql("?", d)
    got = con.execute(sql, [x] * sql.count("?")).fetchone()[0]
    p = 10 ** d
    want = math.floor(x * p + 0.5) / p if d else math.floor(x + 0.5)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32), min_size=1, max_size=16))
def test_fixed_point_cosine_bounds(con, vec):
    """The integer fixed-point cosine of any vector with itself is 1
    within an ulp, and |cos| <= 1 + ulp for any pair (here: v vs -v)."""
    from metoffice_spark.operators.llm import NORM2_DUCK, _cos_duck, _ivec_duck

    # bind the parameter ONCE through a CTE: _ivec_duck references its
    # argument twice since the r10 vector-validity mask, so inlining
    # '?' would change the prepared statement's parameter count
    base = f"SELECT {_ivec_duck('rv')} AS v FROM (SELECT ? AS rv)"
    q = f"""
    WITH a AS ({base}), b AS (SELECT list_transform(v, x -> -x) AS v FROM a),
    an AS (SELECT v, {NORM2_DUCK.format(v='v')} AS n2 FROM a),
    bn AS (SELECT v, {NORM2_DUCK.format(v='v')} AS n2 FROM b)
    SELECT {_cos_duck('an.v', 'an.v', 'an.n2', 'an.n2')} AS self_cos,
           {_cos_duck('an.v', 'bn.v', 'an.n2', 'bn.n2')} AS anti_cos
    FROM an, bn
    """
    row = con.execute(q, [vec]).fetchone()
    self_cos, anti_cos = row
    if self_cos is not None and not math.isnan(self_cos):  # zero vector -> NaN/NULL
        assert abs(self_cos - 1.0) < 1e-12
        assert abs(anti_cos + 1.0) < 1e-12
