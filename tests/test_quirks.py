"""Unit tests for the reference's replication-critical semantic quirks
(SURVEY §2.11) — each quirk is pinned by an explicit assertion."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators import marts
from engineering_school_bigdata_project_f1_weather_spark.plans.f1_model import (
    combined,
    f1_results,
    weather_daily,
)


def test_na_sentinels_present(spark, sf_dir):
    """Quirk 1: 'N/A' sentinels (not NULL) in position/time/fastestLapTime."""
    f1 = f1_results(spark, sf_dir)
    row = f1.agg(
        F.sum((F.col("position") == "N/A").cast("int")).alias("pos_na"),
        F.sum((F.col("time") == "N/A").cast("int")).alias("time_na"),
        F.sum((F.col("fastestLapTime") == "N/A").cast("int")).alias("flt_na"),
        F.sum(F.col("fastestLapTime").isNull().cast("int")).alias("flt_null"),
    ).first()
    assert row.pos_na > 0 and row.time_na > 0
    assert row.flt_na > 0 and row.flt_null > 0  # both variants (T3)


def test_implicit_cast_filter_drops_na(spark, sf_dir):
    """Quirk 3: position='1' matches; 'N/A' casts to NULL and drops."""
    q1 = marts.q1_wins(spark, sf_dir)
    total_wins = q1.agg(F.sum("wins")).first()[0]
    direct = (
        f1_results(spark, sf_dir)
        .join(
            weather_daily(spark, sf_dir).select("city", "country", "date"),
            ["city", "country", "date"],
        )
        .where(F.col("position") == "1")
        .count()
    )
    assert total_wins == direct


def test_lap_time_strings_single_digit_minutes(spark, sf_dir):
    """Quirk 2: 'M:SS.mmm' keeps single-digit minutes so lexicographic order
    is temporal order."""
    f1 = f1_results(spark, sf_dir)
    bad = f1.where(
        F.col("fastestLapTime").isNotNull()
        & (F.col("fastestLapTime") != "N/A")
        & ~F.col("fastestLapTime").rlike(r"^1:\d{2}\.\d{3}$")
    ).count()
    assert bad == 0


def test_total_points_cumulative_resets_per_year(spark, sf_dir):
    """Quirk 5: totalPoints accumulates in race order per (year, driverId)."""
    f1 = f1_results(spark, sf_dir)
    pdf = (
        f1.select("year", "driverId", "date", "points", "totalPoints", "_rk1", "_rk2", "_rk3", "_rk4", "_rk5")
        .orderBy("year", "driverId", "date", "_rk1", "_rk2", "_rk3", "_rk4", "_rk5")
        .limit(50000)
        .toPandas()
    )
    running: dict[tuple, float] = {}
    for row in pdf.itertuples():
        key = (row.year, row.driverId)
        running[key] = running.get(key, 0.0) + row.points
        assert running[key] == row.totalPoints


def test_join_drops_unmatched_cities(spark, sf_dir):
    """J1: inner join silently drops races whose city has no weather."""
    f1_rows = f1_results(spark, sf_dir).count()
    combined_rows = combined(spark, sf_dir).count()
    assert combined_rows < f1_rows  # nations without stations dropped


def test_q9_limit_and_order(spark, sf_dir):
    top = marts.q9_top10(spark, sf_dir).collect()
    assert len(top) == 10
    times = [r.fastestLapTime for r in top]
    assert times == sorted(times)  # lexicographic ascending


def test_q4_year_boundary(spark, sf_dir):
    years = {r.year for r in marts.q4_weather(spark, sf_dir).select("year").distinct().collect()}
    assert years and min(years) >= marts.RECENT_YEAR
