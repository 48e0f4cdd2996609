"""Semantic tests for q_ts_interpolate and q_text_chunk."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_interpolate_observed_buckets_exact_and_gaps_bounded(spark, sf_smoke):
    """Observed buckets keep their own value; interpolated values lie
    between the surrounding observed endpoints (linearity corollary),
    and the grid is identical to q_ts_gapfill's."""
    from metoffice_spark.operators.rain import q_ts_gapfill, q_ts_interpolate

    rows = q_ts_interpolate(spark, sf_smoke).orderBy("station_id", "bucket").collect()
    assert rows and all(r["temp_c"] is not None for r in rows)
    # same grid as gapfill
    n_grid = q_ts_gapfill(spark, sf_smoke).count()
    assert len(rows) == n_grid
    # per station: every gap value within [min, max] of neighbors' obs
    by_station: dict = {}
    for r in rows:
        by_station.setdefault(r["station_id"], []).append(r)
    for series in by_station.values():
        obs_vals = [r["temp_c"] for r in series if not r["is_gap"]]
        lo, hi = min(obs_vals), max(obs_vals)
        for r in series:
            if r["is_gap"]:
                assert lo - 1e-9 <= r["temp_c"] <= hi + 1e-9


def test_chunk_counts_and_sizes(spark, sf_smoke):
    """#chunks per doc = ceil(n_toks / stride); every chunk has 1..64
    tokens; chunk 0 of a long doc is exactly CHUNK_SIZE tokens."""
    from metoffice_spark.io import load
    from metoffice_spark.operators.llm import TOKS_SPARK
    from metoffice_spark.operators.text import _CHUNK_SIZE, _CHUNK_STRIDE, q_text_chunk

    chunks = q_text_chunk(spark, sf_smoke).collect()
    assert chunks
    assert all(1 <= r["n_chunk_toks"] <= _CHUNK_SIZE for r in chunks)
    per_doc: dict = {}
    for r in chunks:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    tok_counts = {
        r["doc_id"]: r["n"]
        for r in load(spark, sf_smoke, "documents")
        .select("doc_id", F.expr(f"size({TOKS_SPARK.format(col='text')})").alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    assert set(per_doc) == set(tok_counts)
    for doc_id, n in tok_counts.items():
        assert per_doc[doc_id] == math.ceil(n / _CHUNK_STRIDE)
