"""metoffice_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
ETL job (``/root/reference/MetOffice_WOW_Connect.txt``, cited as
``MWC:N`` throughout) as an idiomatic Spark engine:

- ``functions/``  — scalar meteorological / unit / text / vector
  column functions (pure Catalyst expressions, no row UDFs).
- ``operators/``  — DataFrame query builders (relational, weather
  time-series, LLM-data-pipeline operators).
- ``sources/``    — ingestion (REST JSON, text scrape, parquet, state
  tables).
- ``sinks/``      — typed record sinks (HTTP form POST, state upsert,
  dead-letter error channel).
- ``streaming/``  — Structured Streaming re-expressions of the
  reference's incremental logic (stateful rain machine, windows).
- ``registry.py`` — qid -> (query builder, DuckDB oracle SQL) map
  that backs ``__spark_entry__.py``.
"""

from metoffice_spark.session import get_spark, tune

__all__ = ["get_spark", "tune"]
