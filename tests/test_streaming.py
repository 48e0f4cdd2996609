"""Streaming-suite semantics: replay determinism (SURVEY §5.2.4), the
dead-letter side channel, and watermark late-drop — properties the
oracle-parity suite can't see (it only checks final values)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stateful_replay_equals_batch(spark, sf_smoke):
    """The applyInPandasWithState rain machine replayed over two
    micro-batches must equal the batch window-function computation —
    the reference's spreadsheet state vs its whole-history recompute."""
    from metoffice_spark.operators.rain import rain_metrics
    from metoffice_spark.operators.streaming_batch import q_stream_stateful

    cols = ["station_id", "obs_id", "r", "dailyrainmm", "rainmm"]
    streamed = _rows(q_stream_stateful(spark, sf_smoke), cols)
    batch = _rows(rain_metrics(spark, sf_smoke), cols)
    assert streamed == batch


def test_sink_dead_letter_channel(spark, sf_smoke):
    """Sensor-fault rows (windspeed==0, the 'error' events) must land in
    the dead-letter parquet, and published + dead == total."""
    from metoffice_spark.obs import observations
    from metoffice_spark.operators.streaming_batch import q_stream_sink

    ok = q_stream_sink(spark, sf_smoke)
    dl_dir = q_stream_sink.last_dead_letter_dir
    assert os.path.isdir(dl_dir)
    dl = spark.read.parquet(dl_dir)
    total = observations(spark, sf_smoke).count()
    n_ok, n_dl = ok.count(), dl.count()
    assert n_dl > 0, "no dead-letter rows — the error channel never fired"
    assert n_ok + n_dl == total
    assert dl.filter(F.col("reason").contains("windspeed")).count() == n_dl


def test_watermark_drops_planted_late_rows(spark, sf_smoke):
    """The planted late rows (obs_id % 89 == 0, older than max-2.5d)
    must be missing from the streaming counts but present in a batch
    aggregation of the same windows."""
    from metoffice_spark.obs import observations
    from metoffice_spark.operators.streaming_batch import q_stream_watermark

    streamed = q_stream_watermark(spark, sf_smoke)
    obs = observations(spark, sf_smoke)
    mx = obs.select(F.max("ts").alias("m")).collect()[0].m
    batch_all = (
        obs.groupBy(
            F.window("ts", "1 hour").alias("w"), "station_id"
        )
        .agg(F.count("*").alias("n_obs"))
        .select("station_id", F.col("w.start").alias("wstart"), "n_obs")
    )
    s = {(r.station_id, r.wstart): r.n_obs for r in streamed.collect()}
    b = {(r.station_id, r.wstart): r.n_obs for r in batch_all.collect()}
    # planted rows' windows
    planted = obs.filter(
        (F.col("obs_id") % 89 == 0)
        & (F.col("ts") <= F.lit(mx) - F.expr("INTERVAL 2 DAY") - F.expr("INTERVAL 12 HOUR"))
    )
    planted_per_window: dict = {}
    for r in planted.select(
        "station_id", F.date_trunc("hour", "ts").alias("h")
    ).collect():
        planted_per_window[(r.station_id, r.h)] = (
            planted_per_window.get((r.station_id, r.h), 0) + 1
        )
    assert planted_per_window, "fixture produced no planted late rows"
    # every planted row is missing from its streamed window (a window
    # holding only dropped rows never materializes at all)
    for k, n_late in planted_per_window.items():
        assert s.get(k, 0) == b[k] - n_late, f"window {k}: late rows not dropped"


def test_session_windows_respect_gap(spark, sf_smoke):
    """No two consecutive observations inside one reported session may
    be >= 30 minutes apart, and session_end == last obs + 30 min."""
    from metoffice_spark.operators.streaming_batch import q_stream_session

    rows = q_stream_session(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        dur = (r.session_end - r.session_start).total_seconds()
        assert dur >= 30 * 60  # at minimum one obs + gap
        # n_obs sessions can't be longer than n_obs * gap
        assert dur <= (r.n_obs) * 30 * 60


def test_tumbling_excludes_open_final_day(spark, sf_smoke):
    """Append mode: the still-open final day must NOT be emitted."""
    from metoffice_spark.obs import observations
    from metoffice_spark.operators.streaming_batch import q_stream_tumbling

    out = q_stream_tumbling(spark, sf_smoke)
    mx_day = (
        observations(spark, sf_smoke)
        .select(F.date_trunc("day", F.max("ts")).alias("d"))
        .collect()[0]
        .d
    )
    assert out.filter(F.col("day_start") == F.lit(mx_day)).count() == 0
    assert out.count() > 0


def test_stream_dedup_suppresses_redelivery(spark, sf_smoke):
    """Redelivered rows (obs_id % 101 == 0, second file) must be
    dropped: output row count == distinct obs count, no dup obs_ids."""
    from metoffice_spark.obs import observations
    from metoffice_spark.operators.streaming_batch import q_stream_dedup

    out = q_stream_dedup(spark, sf_smoke)
    n_obs = observations(spark, sf_smoke).count()
    assert out.count() == n_obs
    assert out.select("obs_id").distinct().count() == n_obs
