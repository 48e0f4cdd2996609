"""Dialect-common SQL snippets shared by Spark queries and DuckDB oracles.

Rounding is the classic cross-engine trap: Spark's ``round``/
``format_string`` use Java HALF_UP, DuckDB's ``printf`` uses C
half-even, and JS ``toFixed`` (the reference, MWC:349-365) rounds
half-away-from-zero on the exact double. To make the two sides of the
correctness harness agree bit-for-bit, every rounded value is computed
with the SAME SQL text on both sides — integer-exact floor arithmetic
that has one defined answer in IEEE doubles:

- ``rhu(x, d)``      → round-half-up to d decimals, returned as DOUBLE
- ``fixed_str(x, d)``→ fixed-precision decimal STRING (toFixed analog)

Spark consumes these via ``F.expr(...)``; oracle SQL embeds the same
text verbatim. Both parsers accept the subset used here (CASE, CAST,
floor, abs, lpad, ``||``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rhu_sql(x: str, d: int) -> str:
    """Round-half-up(+inf) of expression ``x`` to ``d`` decimals, as DOUBLE.

    Non-finite inputs round to NULL (r10 extreme-value probe): Spark's
    ``floor`` converts NaN to BIGINT 0 where DuckDB keeps NaN — a
    SILENT divergence, not even a crash. An unroundable value is an
    invalid measurement; NULL is the engine-agnostic spelling."""
    if d == 0:
        body = f"floor(({x}) + 0.5)"
    else:
        p = 10 ** d
        body = f"(floor(({x}) * {p} + 0.5) / {p})"
    return f"CASE WHEN abs({x}) < CAST('inf' AS DOUBLE) THEN {body} END"


def fixed_str_sql(x: str, d: int) -> str:
    """Fixed ``d``-decimal string of ``x`` via integer-exact arithmetic.

    JS ``toFixed`` analog (MWC:290, 349-365) with half-up-on-abs ties;
    sign handled separately so negative values render correctly.
    """
    if d == 0:
        return (
            f"(CASE WHEN ({x}) < 0 AND floor(abs({x}) + 0.5) > 0 THEN '-' ELSE '' END"
            f" || CAST(CAST(floor(abs({x}) + 0.5) AS BIGINT) AS STRING))"
        )
    p = 10 ** d
    n = f"CAST(floor(abs({x}) * {p} + 0.5) AS BIGINT)"
    whole = f"CAST(floor({n} / CAST({p} AS DOUBLE)) AS BIGINT)"
    frac = f"({n} - {whole} * {p})"
    return (
        f"(CASE WHEN ({x}) < 0 AND {n} > 0 THEN '-' ELSE '' END"
        f" || CAST({whole} AS STRING) || '.'"
        f" || lpad(CAST({frac} AS STRING), {d}, '0'))"
    )


def rhu(x: Column, d: int) -> Column:
    """Column form of ``rhu_sql`` (same arithmetic, DataFrame API)."""
    if d == 0:
        body = F.floor(x + F.lit(0.5)).cast("double")
    else:
        p = float(10 ** d)
        body = F.floor(x * F.lit(p) + F.lit(0.5)) / F.lit(p)
    return F.when(F.abs(x) < F.lit(float("inf")), body)


def fixed_str(x: Column, d: int) -> Column:
    """Column form of ``fixed_str_sql`` via ``F.expr`` on a one-off alias."""
    # Build through expr on a self-contained expression tree: wrap the
    # column into a SQL fragment is impossible generically, so rebuild
    # with Column ops mirroring fixed_str_sql exactly.
    if d == 0:
        n = F.floor(F.abs(x) + F.lit(0.5)).cast("bigint")
        sign = F.when((x < 0) & (n > 0), F.lit("-")).otherwise(F.lit(""))
        return F.concat(sign, n.cast("string"))
    p = 10 ** d
    n = F.floor(F.abs(x) * F.lit(float(p)) + F.lit(0.5)).cast("bigint")
    whole = F.floor(n / F.lit(float(p))).cast("bigint")
    frac = n - whole * F.lit(p)
    sign = F.when((x < 0) & (n > 0), F.lit("-")).otherwise(F.lit(""))
    return F.concat(
        sign, whole.cast("string"), F.lit("."), F.lpad(frac.cast("string"), d, "0")
    )


# --- x-www-form-urlencoded encoding (dialect-common replace chain) ----------
#
# The reference url-encodes its form body implicitly via UrlFetchApp
# (MWC:389-396). A bare space/colon replace corrupts values containing
# '&', '=', '%' or '+' (ADVICE r01), so this encodes the full reserved
# set for the WOW payload charset. Order matters: '%' first (so
# introduced escapes are not re-escaped), literal '+' before space→'+'.

_FORM_ENC_CHAIN = [
    ("%", "%25"),
    ("&", "%26"),
    ("=", "%3D"),
    ("+", "%2B"),
    (":", "%3A"),
    (" ", "+"),
]


def form_enc(c: Column) -> Column:
    """Percent-encode a form value (Column form)."""
    for src, dst in _FORM_ENC_CHAIN:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def form_enc_sql(x: str) -> str:
    """Same encoding as SQL text (valid in Spark SQL and DuckDB)."""
    for src, dst in _FORM_ENC_CHAIN:
        x = f"replace({x}, '{src}', '{dst}')"
    return x
