"""Parquet table IO for the driver tables (TESTDATA.md).

Scans are plain ``spark.read.parquet`` so Catalyst's DSv2 path gives
predicate pushdown, column pruning, and partition pruning for free —
the 100 TB layout assumption is date/key-partitioned parquet, which
the same reader handles via partition discovery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read nanos as long and truncate to micros —
        # the same ns→µs truncation DuckDB applies, so oracle parity holds.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
