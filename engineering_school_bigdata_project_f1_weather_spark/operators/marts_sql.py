"""The reference's SQL surface (SURVEY §2.8): temp-view registration +
``spark.sql`` query texts for Q1-Q9, mirroring
`Lucas files/finalversion:324-384` / `lastupdate1406:315-334`.

The reference built a legacy ``SQLContext(spark)`` wrapper and ran verbatim
SQL strings against a ``races`` temp view of the combined table. This
module keeps that exact entry path (view + SQL text, derived-table
subquery in Q2 included) so a reference user can run their SQL unchanged;
the DataFrame builders in ``marts.py`` are the equivalent programmatic
surface (both are tested equal).

Note: the texts preserve the reference's implicit string casts
(``position = 1``, ``AVG(laps)``), which require an ANSI-off session —
``session.get_spark`` configures that. The ANSI-proof forms live in
``marts.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.f1_model import combined

VIEW = "races"

# Verbatim query shapes (`finalversion:329-384`, `lastupdate1406:319-334`),
# with deterministic tie-breakers added where the reference is
# nondeterministic (SURVEY quirk 6).
SQL_MARTS: dict[str, str] = {
    "wins": f"""
        SELECT driverFullName, year, city, COUNT(*) AS wins
        FROM {VIEW}
        WHERE position = 1
        GROUP BY driverFullName, year, city
        ORDER BY year, wins DESC, driverFullName, city
    """,
    "fastestlap": f"""
        SELECT year, circuit, city, driverFullName, fastestLapTime
        FROM (
            SELECT year, circuit, city, driverFullName, fastestLapTime,
                   ROW_NUMBER() OVER (
                       PARTITION BY year, circuit
                       ORDER BY fastestLapTime, _rk1, _rk2, _rk3, _rk4, _rk5
                   ) AS rn
            FROM {VIEW}
            WHERE fastestLapTime IS NOT NULL AND fastestLapTime != 'N/A'
        ) t
        WHERE rn = 1
        ORDER BY year, circuit
    """,
    "filter": f"""
        SELECT year, city, driverFullName
        FROM {VIEW}
        GROUP BY driverFullName, year, city
    """,
    "weather2324": f"""
        SELECT year, city, driverFullName,
               MIN(tmin) AS temp_min, MAX(tmax) AS temp_max,
               AVG(tavg) AS temp_avg, AVG(prcp) AS precipitation,
               AVG(wspd) AS wspd
        FROM {VIEW}
        WHERE year >= 1999
        GROUP BY year, city, driverFullName
        ORDER BY year, city, driverFullName
    """,
    "evopoints": f"""
        SELECT year, date, driverFullName, totalPoints, city
        FROM {VIEW} ORDER BY year, date, driverFullName
    """,
    "constructor": f"""
        SELECT year, date, driverFullName,
               constructorName AS ConstructorName, totalPoints, city
        FROM {VIEW} ORDER BY year, date, driverFullName
    """,
    "pitstop": f"""
        SELECT year, date, driverFullName, pitStops, city
        FROM {VIEW}
        ORDER BY year, date, ConstructorName, pitStops, city
    """,
    "stats": f"""
        SELECT circuit, AVG(laps) AS avg_laps,
               MAX(fastestLapTime) AS best_lap_time,
               COUNT(*) AS total_races
        FROM {VIEW} GROUP BY circuit ORDER BY circuit
    """,
    "top10": f"""
        SELECT driverFullName, circuit, fastestLapTime
        FROM {VIEW}
        ORDER BY fastestLapTime NULLS LAST, _rk1, _rk2, _rk3, _rk4, _rk5
        LIMIT 10
    """,
}


def register_view(spark: SparkSession, sf_dir: str) -> None:
    """`createOrReplaceTempView('races')` over the combined table
    (`finalversion:328`)."""
    combined(spark, sf_dir).createOrReplaceTempView(VIEW)


def run_sql_mart(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    register_view(spark, sf_dir)
    return spark.sql(SQL_MARTS[name])
