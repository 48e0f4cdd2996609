"""Deterministic synthetic observation stream derived from ``events``.

The reference's data model is a weather-observation time series
(FIXTURES.md §A2; reference MWC:34-39 one observation / 15 min), but
the driver testdata has no such table. This module derives one —
deterministically — from the ``events`` table with a single SQL text
(``OBS_SQL``) that is valid in BOTH Spark SQL and DuckDB, so every
weather query built on it can be oracle-checked value-for-value.

Column semantics mirror FIXTURES.md §A2:
- ``station_id``        partition key for state (4 stations)
- ``tempc``             spans the SMHI temp-correction bands
                        (<-7 / [-7,2) / >=2, MWC:321-327)
- ``windspeed_ms``      0 for 'error' events → exercises the calm
                        branch (MWC:299-307)
- ``winddir_sector``    0-15 (MWC:282-285)
- ``rain_counter_mm``   monotone per-station accumulator (MWC:153-157)
                        via a running window sum — deterministic
                        left-to-right float addition in both engines
- ``rain_sensor_ts``    stale (previous-day) for 'signup' events →
                        exercises the staleness guard (MWC:244)
- ``pressure_site_hpa`` spans 3-digit and 4-digit values — the two
                        slice widths of the scrape fallback
                        (MWC:179-183)

Only dialect-common constructs are used: CAST, CASE WHEN, floor,
arithmetic on doubles, window SUM with ROWS frame, INTERVAL 1 DAY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from metoffice_spark.io import load

OBS_SQL = """
SELECT
  CAST(user_id % 4 AS STRING)                       AS station_id,
  ts                                                AS ts,
  event_id                                          AS obs_id,
  value / CAST(10 AS DOUBLE) - 15.0                 AS tempc,
  20.0 + (value - floor(value / 5) * 5) * 16.0      AS hum,
  CASE WHEN event_type = 'error' THEN CAST(0 AS DOUBLE)
       ELSE value - floor(value / 20) * 20 END      AS windspeed_ms,
  (CASE WHEN event_type = 'error' THEN CAST(0 AS DOUBLE)
        ELSE value - floor(value / 20) * 20 END)
      * 1.3 + 1.0                                   AS windgust_ms,
  CAST(event_id % 16 AS INT)                        AS winddir_sector,
  SUM(CASE WHEN event_type = 'click' THEN CAST(floor(value) AS DOUBLE)
           ELSE CAST(0 AS DOUBLE) END)
      OVER (PARTITION BY user_id % 4 ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      / CAST(100 AS DOUBLE)                         AS rain_counter_mm,
  CASE WHEN event_type = 'signup' THEN ts - INTERVAL 1 DAY
       ELSE ts END                                  AS rain_sensor_ts,
  975.0 + (value - floor(value / 50) * 50)          AS pressure_site_hpa
FROM events
"""

# Site constants, mirroring the reference's config block (MWC:29-104).
SITE_LATITUDE_DEG = 59.0   # φ for the SMHI latitude correction (MWC:319)
SITE_ALTITUDE_M = 45.0     # barometer altitude (MWC:328)
MAST_HEIGHT_M = 5.0        # wind mast height < 10 m → correction (MWC:292-306)
OBS_PER_HOUR = 4           # observ_exec_freq (MWC:34-39)


def observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet → deterministic observations DataFrame."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(OBS_SQL)


def oracle_cte() -> str:
    """``WITH observations AS (...)`` prefix for DuckDB oracle SQL."""
    return f"WITH observations AS ({OBS_SQL})"
