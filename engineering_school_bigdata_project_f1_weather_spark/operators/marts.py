"""The reference's nine analysis queries (SURVEY §2.9) as DataFrame
builders, plus the pipeline-stage outputs P1-P3 and scalar-function
showcases (T6 time parsing, T10 fillna).

Each function takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching DuckDB oracle SQL lives in ``ORACLE_SQL`` (same column aliases, so
the driver's order-insensitive value-hash compares cleanly).

Semantic quirks preserved from the reference (SURVEY §2.11):

- Q1 filters ``position = 1`` on a *string* column holding '1'..'7'/'N/A';
  implemented with ``try_cast`` so it works under ANSI-on sessions too
  (`Lucas files/finalversion:332`).
- Q2/Q8/Q9 order/aggregate lap-time *strings* lexicographically
  (`finalversion:337-347`, `lastupdate1406:319-334`) — not "fixed" to
  numeric; golden outputs encode string ordering.
- W1 ties are nondeterministic in the reference; we add the internal row
  key as tie-breaker for reproducibility (quirk 6).

Scale notes: every query is a declarative plan — Catalyst pushes the Q1/Q4
filters into the parquet scan, prunes columns, and picks partial+final hash
aggregation; the top-k (Q9) compiles to TakeOrderedAndProject (no global
sort materialization).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..plans.f1_model import F1_MODEL_CTE, RK, combined, f1_results, weather_daily
from ..schemas import WEATHER_METRIC_COLS

# Year range of the test lake is 1995-2001; the reference's `year >= 2023`
# cut (`finalversion:363`) maps to the same "last two seasons" semantics.
RECENT_YEAR = 1999


def _drop_rk(df: DataFrame) -> DataFrame:
    return df.drop(*RK)


# --------------------------------------------------------------------- Q1
def q1_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wins per driver/year/city — T2 implicit-cast filter + A1 group-count
    (`Lucas files/finalversion:329-335`)."""
    return (
        combined(spark, sf_dir)
        .where(F.expr("try_cast(position AS INT) = 1"))
        .groupBy("driverFullName", "year", "city")
        .agg(F.count(F.lit(1)).alias("wins"))
        .orderBy("year", F.desc("wins"), "driverFullName", "city")
    )


# --------------------------------------------------------------------- Q2
def q2_fastestlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fastest lap per (year, circuit) — T3 sentinel filter + W1 row_number
    top-1 over the lexicographic lap-time string (`finalversion:337-347`)."""
    c = combined(spark, sf_dir)
    w = Window.partitionBy("year", "circuit").orderBy("fastestLapTime", *RK)
    return (
        c.where(F.col("fastestLapTime").isNotNull() & (F.col("fastestLapTime") != "N/A"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("year", "circuit", "city", "driverFullName", "fastestLapTime")
        .orderBy("year", "circuit")
    )


# --------------------------------------------------------------------- Q3
def q3_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (year, city, driver) via agg-less GROUP BY — A3
    (`finalversion:349-353`)."""
    return (
        combined(spark, sf_dir)
        .select("year", "city", "driverFullName")
        .dropDuplicates()
    )


# --------------------------------------------------------------------- Q4
def q4_weather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Race-weather extremes for recent seasons — T4 range filter + A2
    multi-agg (`finalversion:355-366`)."""
    return (
        combined(spark, sf_dir)
        .where(F.col("year") >= RECENT_YEAR)
        .groupBy("year", "city", "driverFullName")
        .agg(
            F.min("tmin").alias("temp_min"),
            F.max("tmax").alias("temp_max"),
            F.avg("tavg").alias("temp_avg"),
            F.avg("prcp").alias("precipitation"),
            F.avg("wspd").alias("wspd"),
        )
        .orderBy("year", "city", "driverFullName")
    )


# --------------------------------------------------------------------- Q5
def q5_evopoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Championship-points evolution per driver — projection over the A6
    cumulative window + O1 sort (`finalversion:368-372`)."""
    return (
        combined(spark, sf_dir)
        .select("year", "date", "driverFullName", "totalPoints", "city")
        .orderBy("year", "date", "driverFullName")
    )


# --------------------------------------------------------------------- Q6
def q6_constructor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Points evolution with constructor — note the reference aliases the
    column 'ConstructorName' (capital C), resolved case-insensitively
    (`finalversion:374-378`)."""
    return (
        combined(spark, sf_dir)
        .select(
            "year",
            "date",
            "driverFullName",
            F.col("constructorName").alias("ConstructorName"),
            "totalPoints",
            "city",
        )
        .orderBy("year", "date", "driverFullName")
    )


# --------------------------------------------------------------------- Q7
def q7_pitstops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pit stops per race-driver — O2: sorts on non-projected
    constructorName (`finalversion:380-384`), so sort precedes select."""
    return (
        combined(spark, sf_dir)
        .orderBy("year", "date", "constructorName", "pitStops", "city")
        .select("year", "date", "driverFullName", "pitStops", "city")
    )


# --------------------------------------------------------------------- Q8
def q8_circuit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-circuit stats — A4: AVG over the *string* laps column (implicit
    cast) and lexicographic MAX of the lap-time string
    (`lastupdate1406:319-326`)."""
    return (
        combined(spark, sf_dir)
        .groupBy("circuit")
        .agg(
            F.avg(F.expr("try_cast(laps AS DOUBLE)")).alias("avg_laps"),
            F.max("fastestLapTime").alias("best_lap_time"),
            F.count(F.lit(1)).alias("total_races"),
        )
        .orderBy("circuit")
    )


# --------------------------------------------------------------------- Q9
def q9_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by lap-time string — O3 TakeOrderedAndProject
    (`lastupdate1406:329-334`); NULLS LAST + unique tie-break for a
    deterministic result set."""
    return (
        combined(spark, sf_dir)
        .orderBy(F.col("fastestLapTime").asc_nulls_last(), *RK)
        .limit(10)
        .select("driverFullName", "circuit", "fastestLapTime")
    )


# ----------------------------------------------------------------- P1-P3
def p1_f1_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline stage P1: the normalized F1 table (`finalversion:107-192`)."""
    return _drop_rk(f1_results(spark, sf_dir))


def p2_weather_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline stage P2: the normalized weather table (`finalversion:253-272`)."""
    return weather_daily(spark, sf_dir)


def p3_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline stage P3: the combine join J1 (`finalversion:283-293`)."""
    return _drop_rk(combined(spark, sf_dir))


# ------------------------------------------------------- scalar functions
def t6_parse_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: 'HH:MM:SS.ss' race-time string → float seconds, 'N/A' → NULL —
    the reference's ``parse_time`` (`finalversion:33-53`) as a native
    split+cast expression (no Python in the hot path)."""
    c = combined(spark, sf_dir)
    parts = F.split(F.col("time"), ":")
    secs = (
        parts.getItem(0).cast("double") * 3600.0
        + parts.getItem(1).cast("double") * 60.0
        + parts.getItem(2).cast("double")
    )
    return c.select(
        "year",
        "driverId",
        "date",
        "time",
        F.when(F.col("time") == "N/A", F.lit(None).cast("double"))
        .otherwise(secs)
        .alias("race_seconds"),
    )


def t10_weather_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: null-fill before serving (`Martin files/elsastic parquet.py:22`)
    — ``na.fill(0)`` over the weather metric columns."""
    return weather_daily(spark, sf_dir).na.fill(0.0, subset=WEATHER_METRIC_COLS)


# ---------------------------------------------------------------- oracles

_Q4_AGG = """
SELECT year, city, driverFullName,
       MIN(tmin) AS temp_min,
       MAX(tmax) AS temp_max,
       AVG(tavg) AS temp_avg,
       AVG(prcp) AS precipitation,
       AVG(wspd) AS wspd
FROM combined
WHERE year >= {year}
GROUP BY year, city, driverFullName
""".format(year=RECENT_YEAR)

ORACLE_SQL: dict[str, str] = {
    "q1_wins": F1_MODEL_CTE
    + """
    SELECT driverFullName, year, city, COUNT(*) AS wins
    FROM combined
    WHERE TRY_CAST(position AS INTEGER) = 1
    GROUP BY driverFullName, year, city
    """,
    "q2_fastestlap": F1_MODEL_CTE
    + """
    SELECT year, circuit, city, driverFullName, fastestLapTime
    FROM (
        SELECT year, circuit, city, driverFullName, fastestLapTime,
               ROW_NUMBER() OVER (
                   PARTITION BY year, circuit
                   ORDER BY fastestLapTime, _rk1, _rk2, _rk3, _rk4, _rk5
               ) AS rn
        FROM combined
        WHERE fastestLapTime IS NOT NULL AND fastestLapTime <> 'N/A'
    ) ranked
    WHERE rn = 1
    """,
    "q3_filter": F1_MODEL_CTE
    + """
    SELECT year, city, driverFullName FROM combined
    GROUP BY year, city, driverFullName
    """,
    "q4_weather": F1_MODEL_CTE + _Q4_AGG,
    "q5_evopoints": F1_MODEL_CTE
    + """
    SELECT year, date, driverFullName, totalPoints, city FROM combined
    """,
    "q6_constructor": F1_MODEL_CTE
    + """
    SELECT year, date, driverFullName,
           constructorName AS ConstructorName, totalPoints, city
    FROM combined
    """,
    "q7_pitstops": F1_MODEL_CTE
    + """
    SELECT year, date, driverFullName, pitStops, city FROM combined
    ORDER BY year, date, constructorName, pitStops, city
    """,
    "q8_circuit_stats": F1_MODEL_CTE
    + """
    SELECT circuit,
           AVG(TRY_CAST(laps AS DOUBLE)) AS avg_laps,
           MAX(fastestLapTime) AS best_lap_time,
           COUNT(*) AS total_races
    FROM combined
    GROUP BY circuit
    """,
    "q9_top10": F1_MODEL_CTE
    + """
    SELECT driverFullName, circuit, fastestLapTime FROM combined
    ORDER BY fastestLapTime NULLS LAST, _rk1, _rk2, _rk3, _rk4, _rk5
    LIMIT 10
    """,
    "p1_f1_formatted": F1_MODEL_CTE
    + """
    SELECT year, round, raceName, circuit, city, country, date, driverId,
           driverFullName, constructorName, points, totalPoints, position,
           grid, laps, status, time, fastestLapTime, pitStops
    FROM f1
    """,
    "p2_weather_daily": F1_MODEL_CTE
    + """
    SELECT date, tavg, tmin, tmax, prcp, snow, wdir, wspd, wpgt, pres, tsun,
           country, city
    FROM weather
    """,
    "p3_combined": F1_MODEL_CTE
    + """
    SELECT year, round, raceName, circuit, city, country, date, driverId,
           driverFullName, constructorName, points, totalPoints, position,
           grid, laps, status, time, fastestLapTime, pitStops,
           tavg, tmin, tmax, prcp, snow, wdir, wspd, wpgt, pres, tsun
    FROM combined
    """,
    "t6_parse_time": F1_MODEL_CTE
    + """
    SELECT year, driverId, date, time,
           CASE WHEN time = 'N/A' THEN NULL
                ELSE CAST(string_split(time, ':')[1] AS DOUBLE) * CAST(3600.0 AS DOUBLE)
                   + CAST(string_split(time, ':')[2] AS DOUBLE) * CAST(60.0 AS DOUBLE)
                   + CAST(string_split(time, ':')[3] AS DOUBLE)
           END AS race_seconds
    FROM combined
    """,
    "t10_weather_filled": F1_MODEL_CTE
    + """
    SELECT date,
           COALESCE(tavg, CAST(0.0 AS DOUBLE)) AS tavg,
           COALESCE(tmin, CAST(0.0 AS DOUBLE)) AS tmin,
           COALESCE(tmax, CAST(0.0 AS DOUBLE)) AS tmax,
           COALESCE(prcp, CAST(0.0 AS DOUBLE)) AS prcp,
           COALESCE(snow, CAST(0.0 AS DOUBLE)) AS snow,
           COALESCE(wdir, CAST(0.0 AS DOUBLE)) AS wdir,
           COALESCE(wspd, CAST(0.0 AS DOUBLE)) AS wspd,
           COALESCE(wpgt, CAST(0.0 AS DOUBLE)) AS wpgt,
           COALESCE(pres, CAST(0.0 AS DOUBLE)) AS pres,
           COALESCE(tsun, CAST(0.0 AS DOUBLE)) AS tsun,
           country, city
    FROM weather
    """,
}

QUERIES = {
    "q1_wins": q1_wins,
    "q2_fastestlap": q2_fastestlap,
    "q3_filter": q3_filter,
    "q4_weather": q4_weather,
    "q5_evopoints": q5_evopoints,
    "q6_constructor": q6_constructor,
    "q7_pitstops": q7_pitstops,
    "q8_circuit_stats": q8_circuit_stats,
    "q9_top10": q9_top10,
    "p1_f1_formatted": p1_f1_formatted,
    "p2_weather_daily": p2_weather_daily,
    "p3_combined": p3_combined,
    "t6_parse_time": t6_parse_time,
    "t10_weather_filled": t10_weather_filled,
}
