"""Golden-value tests for the REF scalar formulas (SURVEY.md §5.2.2).

Hand-computed expectations replicate the reference AS WRITTEN,
including the 17.7 dew-point constant (MWC:191) and the calm-gust
quirk (MWC:299-305).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from metoffice_spark.functions import weather as W


def _one(spark, cols: dict) -> dict:
    df = spark.range(1).select(*[v.alias(k) for k, v in cols.items()])
    return df.collect()[0].asDict()


def test_dewpoint_as_written(spark):
    # t=20, h=65: g = (17.27*20)/(237.7+20) + ln(0.65); dewpt = 237.7*g/(17.7-g)
    g = (17.27 * 20) / (237.7 + 20) + math.log(0.65)
    expected = 237.7 * g / (17.7 - g)
    got = _one(spark, {"d": W.dewpoint_c(F.lit(20.0), F.lit(65.0))})["d"]
    assert got == pytest.approx(expected, rel=1e-12)
    # the quirk constant 17.7 (not 17.27) must be preserved
    textbook = 237.7 * g / (17.27 - g)
    assert abs(got - textbook) > 1e-3


def test_dewpoint_leq_temp_property(spark):
    rows = (
        spark.range(200)
        .select(
            (F.col("id") / 4.0 - 10.0).alias("t"),
            ((F.col("id") % 100) + 1.0).alias("h"),
        )
        .select("t", "h", W.dewpoint_c(F.col("t"), F.col("h")).alias("d"))
        .collect()
    )
    for r in rows:
        if r.h <= 100.0:
            assert r.d <= r.t + 1e-9, f"dewpoint {r.d} > temp {r.t} at h={r.h}"


def test_mast_correction_at_5m(spark):
    expected = 1.0 / (0.233 + 0.656 * math.log10(5.0 + 4.75))
    got = _one(spark, {"c": W.mast_correction(5.0)})["c"]
    assert got == pytest.approx(expected, rel=1e-12)


def test_gust_uncorrected_when_calm(spark):
    # MWC:299-305: gust is only corrected when *speed* != 0
    row = _one(
        spark,
        {
            "g_calm": W.corrected_windgust(F.lit(7.0), F.lit(0.0), 5.0),
            "g_wind": W.corrected_windgust(F.lit(7.0), F.lit(3.0), 5.0),
            "s_calm": W.corrected_windspeed(F.lit(0.0), 5.0),
        },
    )
    assert row["g_calm"] == 7.0
    assert row["g_wind"] == pytest.approx(7.0 / (0.233 + 0.656 * math.log10(9.75)))
    assert row["s_calm"] == 0.0


def test_winddir_decode(spark):
    cases = [
        # (sector, speed, expected) — MWC:282-307
        (0, 5.0, "360"),
        (0, 0.0, "000"),
        (4, 3.0, "90"),
        (1, 3.0, "23"),   # 22.5 rounds half-up to 23
        (5, 0.0, "000"),  # calm wins regardless of sector
        (15, 2.0, "338"), # 337.5 → 338
    ]
    for sector, speed, expected in cases:
        got = _one(
            spark, {"w": W.wind_dir_str(F.lit(sector), F.lit(speed))}
        )["w"]
        assert got == expected, f"sector={sector} speed={speed}: {got} != {expected}"


def test_baro_tempcorr_band_edges(spark):
    # MWC:321-327: t<-7 → 0.5t+275; -7<=t<2 → 0.535t+275.6; t>=2 → 1.07t+274.5
    cases = {
        -7.001: 0.5 * -7.001 + 275.0,
        -7.0: 0.535 * -7.0 + 275.6,   # -7.0 falls in the middle band (>=)
        1.999: 0.535 * 1.999 + 275.6,
        2.0: 1.07 * 2.0 + 274.5,      # 2.0 falls in the upper band
    }
    for t, expected in cases.items():
        got = _one(spark, {"c": W.baro_temp_correction(F.lit(t))})["c"]
        assert got == pytest.approx(expected, rel=1e-12), f"t={t}"


def test_sea_level_pressure(spark):
    lat_corr = 0.034163 * (1 - 0.0026373 * math.cos(math.radians(2 * 59.0)))
    tempcorr = 1.07 * 10.0 + 274.5
    expected = 1000.0 * math.exp(45.0 * lat_corr / tempcorr)
    got = _one(
        spark, {"p": W.sea_level_pressure_hpa(F.lit(1000.0), F.lit(10.0), 59.0, 45.0)}
    )["p"]
    assert got == pytest.approx(expected, rel=1e-12)


def test_unit_conversions(spark):
    row = _one(
        spark,
        {
            "f": W.c_to_f(F.lit(100.0)),
            "mph": W.ms_to_mph(F.lit(10.0)),
            "inch": W.mm_to_in(F.lit(25.4)),
            "inhg": W.hpa_to_inhg(F.lit(1013.25)),
        },
    )
    assert row["f"] == 212.0
    assert row["mph"] == pytest.approx(22.36936)
    assert row["inch"] == pytest.approx(1.0000005)
    assert row["inhg"] == pytest.approx(29.92125534, rel=1e-8)


def test_fixed_str_parity_forms(spark):
    from metoffice_spark.parity import fixed_str

    row = _one(
        spark,
        {
            "a": fixed_str(F.lit(3.14159), 2),
            "b": fixed_str(F.lit(-2.5), 0),
            "c": fixed_str(F.lit(0.0005), 3),
            "d": fixed_str(F.lit(99.995), 2),
            "e": fixed_str(F.lit(-0.04), 1),
        },
    )
    assert row["a"] == "3.14"
    assert row["b"] == "-3"  # half-up on abs, sign reapplied
    assert row["c"] == "0.001"
    assert row["d"] == "100.00"
    # sign is dropped when the rounded magnitude is zero (documented
    # deviation from JS toFixed's "-0.0"; both engines share it)
    assert row["e"] == "0.0"
