"""Local replica of the driver's DuckDB-oracle correctness gate.

Compares a Spark query result against its DuckDB oracle on row count,
schema (normalized type classes), and order-insensitive exact values
(floats must agree bitwise — the parity helpers exist to make that
true). Used by ``tools/check_parity.py`` and the pytest suite.
"""

from __future__ import annotations

import math

import duckdb

from metoffice_spark.io import TABLES, table_path

_TYPEMAP = {
    "bigint": "i", "int": "i", "integer": "i", "smallint": "i", "tinyint": "i",
    # NOTE: hugeint deliberately NOT mapped to "i". DuckDB promotes
    # sum(BIGINT) to HUGEINT (int128); the driver hashes results through
    # Arrow where int128 becomes decimal128/float64 and the value hash
    # diverges from Spark's int64 even when values are equal (round-2
    # q_rollup_hypertable failure). Leaving it unmapped makes the local
    # gate fail the coltype check, forcing CAST(sum(..) AS BIGINT) in
    # every oracle text.
    "double": "f", "float": "f",
    "string": "s", "varchar": "s",
    "boolean": "b",
    "timestamp": "t", "timestamp_ntz": "t",
    "date": "d",
}

# DuckDB output types that are representable locally but hash differently
# once routed through Arrow (the driver's comparison path). Any oracle
# emitting one of these is a latent driver-red even if values match.
_ARROW_DIVERGENT = {"hugeint", "uhugeint"}


def _norm_type(t: str) -> str:
    """Normalize a type string to a cross-engine class. Arrays
    normalize recursively (Spark ``array<int>`` and DuckDB
    ``integer[]`` are both Arrow ``list<int32>``) but ELEMENT classes
    still matter: list<int32> vs list<int64> hash differently."""
    t = t.lower().strip()
    if t.endswith("[]"):
        return f"a<{_norm_type(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"a<{_norm_type(t[6:-1])}>"
    return _TYPEMAP.get(t, t)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return v


def connect_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def compare(spark, con, fn, sql, sf_dir: str) -> list[str]:
    """Run query + oracle; return a list of problems (empty = pass)."""
    sdf = fn(spark, sf_dir)
    srows = [tuple(_canon(v) for v in row) for row in sdf.collect()]
    scols = [(f.name.lower(), _norm_type(f.dataType.simpleString())) for f in sdf.schema.fields]

    rel = con.sql(sql)
    orows = [tuple(_canon(v) for v in row) for row in rel.fetchall()]
    ocols = [(c.lower(), _norm_type(str(t))) for c, t in zip(rel.columns, rel.types)]

    problems: list[str] = []
    divergent = [
        c for c, t in zip(rel.columns, rel.types)
        if str(t).lower() in _ARROW_DIVERGENT or "decimal" in str(t).lower()
    ]
    if divergent:
        problems.append(
            f"oracle emits Arrow-divergent types (driver hash will differ): "
            f"{divergent} — wrap in CAST(... AS BIGINT/DOUBLE)"
        )
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if [c for c, _ in scols] != [c for c, _ in ocols]:
        problems.append(
            f"colnames spark={[c for c, _ in scols]} oracle={[c for c, _ in ocols]}"
        )
    elif [t for _, t in scols] != [t for _, t in ocols]:
        problems.append(f"coltypes spark={scols} oracle={ocols}")
    # Driver-path simulation (VERDICT r03 item 8): the driver
    # canonicalizes result rows through a pandas sort over every
    # column; element types pandas cannot factorize (ndarray/list from
    # array columns, dict from maps) kill the driver's CHECKER even
    # when Spark's values are right (the r03 q_tokenize_ids red).
    # Collected rows reproduce the same unhashability, so this stays
    # a zero-extra-execution check.
    import pandas as pd

    for label, rows, cols in (("spark", srows, scols), ("oracle", orows, ocols)):
        pdf = pd.DataFrame(rows, columns=[c for c, _ in cols]) if rows else None
        if pdf is None:
            continue
        for i, col in enumerate(pdf.columns):
            series = pdf.iloc[:, i]
            if series.dtype != object:
                continue
            try:
                # the exact operation the driver's lexsort runs per key
                pd.factorize(series)
            except TypeError as e:
                problems.append(
                    f"{label} column {col!r} breaks the driver's pandas "
                    f"canonicalizer ({e}) — stringify it (array_join pattern)"
                )
    if not problems:
        order = sorted(range(len(scols)), key=lambda i: scols[i][0])
        skey = sorted(tuple(str(r[i]) for i in order) for r in srows)
        okey = sorted(tuple(str(r[i]) for i in order) for r in orows)
        if skey != okey:
            ndiff = sum(1 for a, b in zip(skey, okey) if a != b)
            problems.append(f"values differ in {ndiff}/{len(skey)} rows")
            for a, b in zip(skey, okey):
                if a != b:
                    problems.append(f"  spark : {a}")
                    problems.append(f"  oracle: {b}")
                    break
    return problems
