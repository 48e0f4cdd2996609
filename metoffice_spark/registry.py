"""qid → (query builder, oracle SQL | None) registry.

Backs ``__spark_entry__.py``: ``queries()`` / ``oracle_sql()`` are
projections of this dict. Modules register themselves by exposing a
``QUERIES`` mapping ``{qid: (builder, oracle_sql_or_None)}``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    from metoffice_spark.operators import weather

    modules = [weather]
    for name in (
        "rain",
        "ingest",
        "relational",
        "analytics",
        "llm",
        "text",
        "udf",
        "streaming_batch",
    ):
        try:
            mod = __import__(f"metoffice_spark.operators.{name}", fromlist=["QUERIES"])
            modules.append(mod)
        except ImportError:
            continue
    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in modules:
        for qid, spec in mod.QUERIES.items():
            if qid in merged:
                raise ValueError(f"duplicate qid {qid!r}")
            merged[qid] = spec
    return merged


def all_queries() -> dict[str, QueryFn]:
    return {qid: fn for qid, (fn, _) in _collect().items()}

def all_oracles() -> dict[str, str]:
    return {qid: sql for qid, (_, sql) in _collect().items() if sql is not None}
