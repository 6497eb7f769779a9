"""The full reference pipeline as one callable DAG (SURVEY §3.1) — the
Airflow-free runner: raw zone → formatted zone → combined → usage marts.

The reference ran each stage as a separate Airflow PythonOperator with its
own SparkSession (`finalversion:428-530`, quirk 10 — no plan/cache reuse);
here one session runs the whole DAG, the combined table is computed once
and cached across the nine mart writes, and every stage is a distributed
plan (no driver-side loops).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators import marts_sql
from .sources import ergast
from .sources import weather as weather_src
from .sources.sinks import write_mart, write_parquet


@dataclass
class PipelineResult:
    formatted_rows: int
    weather_rows: int
    combined_rows: int
    mart_paths: dict[str, str] = field(default_factory=dict)


def run(
    spark: SparkSession,
    raw_dir: str,
    out_dir: str,
    stations: DataFrame,
    compat_single_file: bool = False,
) -> PipelineResult:
    """raw JSON/CSV → formatted parquet → combined parquet → 9 marts."""
    # P1: F1 normalization (distributed; replaces finalversion:107-192)
    f1 = ergast.normalize(spark, raw_dir)
    write_parquet(f1, f"{out_dir}/formatted/ergastF1", ["year"], compat_single_file)

    # P2: weather normalization (one glob scan; replaces :253-272)
    w = weather_src.read_weather(spark, raw_dir, stations)
    write_parquet(w, f"{out_dir}/formatted/meteostat", None, compat_single_file)

    # P3: combine join (J1, broadcast weather; replaces :283-293)
    combined = weather_src.combine(
        spark.read.parquet(f"{out_dir}/formatted/ergastF1"),
        spark.read.parquet(f"{out_dir}/formatted/meteostat"),
    ).cache()
    write_parquet(combined, f"{out_dir}/combined", None, compat_single_file)

    # P4: usage marts via the SQL surface (reference entry point 2).
    # The combined view here comes from the lake, not the test tables, so
    # register it directly. Reference SQL texts run unchanged except for
    # the _rk tie-breakers, which the lake table doesn't need:
    combined.createOrReplaceTempView(marts_sql.VIEW)
    result = PipelineResult(
        formatted_rows=f1.count(),
        weather_rows=w.count(),
        combined_rows=combined.count(),
    )
    for name, sql in marts_sql.SQL_MARTS.items():
        if "_rk1" in sql:  # tie-break columns exist only in the test model
            sql = sql.replace(", _rk1, _rk2, _rk3, _rk4, _rk5", ", driverId")
        mart = spark.sql(sql)
        result.mart_paths[name] = write_mart(
            mart, f"{out_dir}/usage", name, compat_single_file
        )
    combined.unpersist()
    return result
