"""SQL-surface parity (marts_sql vs marts DataFrame builders), sink
behavior (quirk-7 path mapping, compat single file), and the end-to-end
pipeline runner over raw fixtures."""

from __future__ import annotations

import os

import pytest

from tools.selfcheck import canon_rows

from engineering_school_bigdata_project_f1_weather_spark.operators import marts, marts_sql
from engineering_school_bigdata_project_f1_weather_spark.sources.sinks import mart_path
from engineering_school_bigdata_project_f1_weather_spark import pipeline

from tests.test_etl import CITIES, WEATHER_ONLY_CITY, raw_dir  # noqa: F401

SQL_TO_DF = {
    "wins": marts.q1_wins,
    "fastestlap": marts.q2_fastestlap,
    "filter": marts.q3_filter,
    "evopoints": marts.q5_evopoints,
    "constructor": marts.q6_constructor,
    "pitstop": marts.q7_pitstops,
    "top10": marts.q9_top10,
}


@pytest.mark.parametrize("name", sorted(SQL_TO_DF))
def test_sql_surface_matches_dataframe_builders(name, spark, sf_dir):
    sql_df = marts_sql.run_sql_mart(spark, sf_dir, name)
    df_df = SQL_TO_DF[name](spark, sf_dir)
    h1, _ = canon_rows(sql_df.columns, [tuple(r) for r in sql_df.collect()])
    h2, _ = canon_rows(df_df.columns, [tuple(r) for r in df_df.collect()])
    assert sorted(c.lower() for c in sql_df.columns) == sorted(
        c.lower() for c in df_df.columns
    )
    assert h1 == h2


def test_mart_path_quirk7():
    assert mart_path("/u", "wins") == "/u/analysis_1/wins.parquet"
    assert mart_path("/u", "filter") == "/u/analysis_3/filter.parquet"
    # quirk 7 preserved: filter written into the fastest-lap folder
    assert mart_path("/u", "filter", preserve_path_bug=True) == "/u/analysis_2/filter.parquet"


def test_pipeline_end_to_end(spark, raw_dir, tmp_path):  # noqa: F811
    stations = spark.createDataFrame(
        [(c, CITIES[c][0]) for c in CITIES if CITIES[c][1]] + [WEATHER_ONLY_CITY],
        ["city", "country"],
    )
    out = str(tmp_path / "lake")
    res = pipeline.run(spark, raw_dir, out, stations)
    assert res.formatted_rows > 0
    assert res.combined_rows > 0
    assert len(res.mart_paths) == 9
    for name, path in res.mart_paths.items():
        assert os.path.exists(path), name
        assert spark.read.parquet(path).count() >= 0
    wins = spark.read.parquet(res.mart_paths["wins"])
    assert set(wins.columns) == {"driverFullName", "year", "city", "wins"}
    # partition pruning layout: formatted zone is year-partitioned
    assert any(
        p.startswith("year=") for p in os.listdir(f"{out}/formatted/ergastF1")
    )


def test_compat_single_file_roundtrip(spark, sf_dir, tmp_path):
    """Quirk 9 end-to-end (VERDICT r1 item 8): compat mode writes the mart
    as the reference's coalesce(1) single-file layout; re-reading it yields
    the same rows as the in-memory mart."""
    from engineering_school_bigdata_project_f1_weather_spark.sources.sinks import write_mart

    df = marts.q1_wins(spark, sf_dir)
    path = write_mart(df, str(tmp_path / "usage"), "wins", compat_single_file=True)
    parts = [p for p in os.listdir(path) if p.startswith("part-")]
    assert len(parts) == 1, f"expected single part file, got {parts}"

    back = spark.read.parquet(path)
    h1, _ = canon_rows(df.columns, [tuple(r) for r in df.collect()])
    h2, _ = canon_rows(back.columns, [tuple(r) for r in back.collect()])
    assert sorted(back.columns) == sorted(df.columns)
    assert h1 == h2
