"""The reference's F1/weather data model, derived deterministically from the
driver's TPC-H-ish test lake.

The reference pipeline (SURVEY §1.1) produces three tables:

- ``formatted_ergastF1_data`` — one row per (race, driver),
  `Lucas files/finalversion:107-192`;
- ``METEO2_data_aggregated``  — one row per (city, date),
  `Lucas files/finalversion:253-272`;
- ``combined_data``           — inner join on (city, country, date),
  `Lucas files/finalversion:283-293`.

Its real inputs (Ergast/Meteostat REST) are unavailable offline, so this
module derives the *same shapes with the same semantic quirks* (SURVEY
§2.11: string dates, string lap times, 'N/A' sentinels, cumulative points)
from the test lake: race ≡ order, race-driver entry ≡ lineitem,
city ≡ nation, driver ≡ supplier.

Cross-engine determinism contract
---------------------------------
Every Spark expression here has a DuckDB twin in ``F1_MODEL_CTE`` and must
hash bit-identically. The rules that guarantee that:

- integer arithmetic only, cast to double at the end (exact);
- doubles are exact quarter-fractions (k * 0.25) so sums/avgs stay exact
  and order-independent;
- string formatting via printf-style with values that never round;
- naive parquet timestamps formatted as wall-clock (round-trips in any
  session timezone).

Scale notes (100 TB): the weather side is |cities × dates| — small relative
to the fact side, so the combine join is broadcast (reference J1, SURVEY
§2.3). The fact-side joins (lineitem ⋈ orders ⋈ customer) are key-partitioned
shuffles Catalyst/AQE plans; nation/region/supplier get explicit broadcast
hints.
"""

from __future__ import annotations

import weakref

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.storagelevel import StorageLevel

from ..schemas import F1_FORMATTED, WEATHER_DAILY
from ..sources.tables import load_table

# The reference materializes ``combined_data.parquet`` ONCE and runs all
# nine usage queries over the mart (`Lucas files/finalversion:283-293,326`).
# We mirror that staging in-session: the model frames are built once per
# (session, sf_dir) and persisted, so Q1-Q9 scan the materialized relation
# instead of re-running the 6-table join + window. At cluster scale the
# same role is played by writing the combined mart to parquet (see
# pipeline.py); MEMORY_AND_DISK keeps local iteration spill-safe.
_MODEL_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _staged(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    per_session = _MODEL_CACHE.setdefault(spark, {})
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is not None and df.storageLevel == StorageLevel.NONE:
        # A spark.catalog.clearCache() (the registry's documented
        # between-invocations hygiene — selfcheck/bench both call it)
        # unpersists the staged frame but leaves this memo handle alive;
        # without re-staging, every later mart query would silently
        # recompute the whole model per action instead of scanning the
        # materialized relation (round 5: measured p3_combined 0.26 →
        # 4.0 s under the benchmark's clear-between-queries policy).
        df = None
    if df is None:
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        per_session[key] = df
    return df

# Internal tie-break columns, unique per combined row at every scale factor:
# (l_orderkey, l_linenumber, l_partkey, l_suppkey, l_linestatus). Kept so
# W1's row_number and Q9's LIMIT are deterministic (SURVEY §2.11 quirk 6);
# dropped from user-facing outputs.
RK = ["_rk1", "_rk2", "_rk3", "_rk4", "_rk5"]

_POINTS = {1: 25.0, 2: 18.0, 3: 15.0, 4: 12.0, 5: 10.0, 6: 8.0, 7: 6.0}


def f1_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged (memoized+persisted) ``formatted_ergastF1_data`` — see
    ``_staged``."""
    return _staged(spark, sf_dir, "f1", lambda: _build_f1_results(spark, sf_dir))


def _build_f1_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``formatted_ergastF1_data`` shape (SURVEY §1.2) + internal row keys.

    Replaces the reference's driver-side Python normalization loop
    (`Lucas files/finalversion:112-189`) with distributed DataFrame ops:
    the cumulative ``totalPoints`` (SURVEY A6) is a window sum instead of a
    Python dict, and race/lap time strings (T7) are ``format_string`` JVM
    expressions instead of driver ``format_time`` calls.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")

    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
    )

    race_secs = (
        (F.lit(5400) + F.col("l_orderkey") % 1800).cast("double")
        + (F.col("l_linenumber") - 1).cast("double") * F.lit(5.25)
    )
    hh = F.floor(race_secs / F.lit(3600.0)).cast("int")
    mm = F.floor((race_secs % F.lit(3600.0)) / F.lit(60.0)).cast("int")
    ss = race_secs % F.lit(60.0)

    points = F.lit(0.0)
    for ln, pts in sorted(_POINTS.items(), reverse=True):
        points = F.when(F.col("l_linenumber") == ln, F.lit(pts)).otherwise(points)

    fl_ss = (F.lit(7) + F.col("l_partkey") % 50).cast("int")
    fl_ms = ((F.col("l_suppkey") * 7 + F.col("l_orderkey")) % 1000).cast("int")

    base = j.select(
        F.year("o_orderdate").cast("long").alias("year"),
        F.month("o_orderdate").cast("string").alias("round"),
        F.concat(F.col("n_name"), F.lit(" Grand Prix")).alias("raceName"),
        F.concat(F.col("n_name"), F.lit(" Circuit")).alias("circuit"),
        F.col("n_name").alias("city"),
        F.col("r_name").alias("country"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
        F.concat(F.lit("driver_"), F.col("l_suppkey").cast("string")).alias("driverId"),
        F.col("s_name").alias("driverFullName"),
        F.concat(F.lit("Constructor "), F.col("s_nationkey").cast("string")).alias(
            "constructorName"
        ),
        points.alias("points"),
        # 'N/A' sentinel instead of NULL — quirk 1 (`finalversion:148`).
        F.when(F.col("l_returnflag") == "R", F.lit("N/A"))
        .otherwise(F.col("l_linenumber").cast("string"))
        .alias("position"),
        (F.lit(1) + F.col("l_partkey") % 20).cast("string").alias("grid"),
        (F.lit(50) + F.col("l_orderkey") % 25).cast("string").alias("laps"),
        F.when(F.col("l_returnflag") == "R", F.lit("Accident"))
        .when(F.col("l_linenumber") == 1, F.lit("Finished"))
        .otherwise(F.lit("+1 Lap"))
        .alias("status"),
        # Absolute race time 'HH:MM:SS.ss' (reference T7/T8 reconstruction,
        # `finalversion:153-165`); 'N/A' for non-finishers.
        F.when(F.col("l_returnflag") == "R", F.lit("N/A"))
        .otherwise(F.format_string("%02d:%02d:%05.2f", hh, mm, ss))
        .alias("time"),
        # 'M:SS.mmm' — single-digit minutes so lexicographic order equals
        # temporal order (quirk 2); NULL and 'N/A' variants exercise T3.
        F.when(F.col("l_returnflag") == "R", F.lit("N/A"))
        .when(
            (F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F"),
            F.lit(None).cast("string"),
        )
        .otherwise(F.format_string("1:%02d.%03d", fl_ss, fl_ms))
        .alias("fastestLapTime"),
        (F.col("l_linenumber") % 4).cast("long").alias("pitStops"),
        F.col("l_orderkey").alias("_rk1"),
        F.col("l_linenumber").alias("_rk2"),
        F.col("l_partkey").alias("_rk3"),
        F.col("l_suppkey").alias("_rk4"),
        F.col("l_linestatus").alias("_rk5"),
    )

    # A6: cumulative championship points per (year, driver) in race order —
    # the reference's driver-side dict accumulation (`finalversion:146-147`)
    # as a distributed running-sum window (W2 frame).
    w = (
        Window.partitionBy("year", "driverId")
        .orderBy("date", *RK)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols = [f.name for f in F1_FORMATTED.fields] + RK
    return base.withColumn("totalPoints", F.sum("points").over(w)).select(*cols)


def weather_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged (memoized+persisted) ``METEO2_data_aggregated`` — see
    ``_staged``."""
    return _staged(
        spark, sf_dir, "weather", lambda: _build_weather_daily(spark, sf_dir)
    )


def _build_weather_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``METEO2_data_aggregated`` shape — one row per (city, date).

    Nations with ``n_nationkey % 5 == 4`` have no weather station: their
    races drop out of the combine join, reproducing the reference's silent
    city-mismatch row loss (SURVEY §2.3 J1).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("n_nationkey") % 5 != 4)
        .select(
            F.col("n_name").alias("city"),
            F.col("r_name").alias("country"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
            F.col("n_nationkey").alias("nk"),
            F.dayofyear("o_orderdate").alias("doy"),
        )
        .distinct()
    )

    tavg = (
        F.col("nk").cast("double")
        + (F.col("doy") % 30).cast("double") * F.lit(0.5)
        - F.lit(5.0)
    )
    wspd = (F.col("doy") % 15).cast("double") * F.lit(0.75)
    staged = base.withColumn("tavg", tavg).withColumn("wspd", wspd)

    cols = [f.name for f in WEATHER_DAILY.fields]
    return staged.select(
        "city",
        "country",
        "date",
        "tavg",
        (F.col("tavg") - F.lit(5.25)).alias("tmin"),
        (F.col("tavg") + F.lit(6.5)).alias("tmax"),
        F.when(F.col("doy") % 3 == 0, F.lit(0.0))
        .otherwise((F.col("doy") % 7).cast("double") * F.lit(1.25))
        .alias("prcp"),
        F.when(F.col("tavg") - F.lit(5.25) < 0.0, F.lit(1.5))
        .otherwise(F.lit(0.0))
        .alias("snow"),
        ((F.col("doy") * 7) % 360).cast("double").alias("wdir"),
        "wspd",
        # NULL gaps exercise the fillna path (reference T10).
        F.when(F.col("doy") % 11 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("wspd") * F.lit(2.0))
        .alias("wpgt"),
        (F.lit(1000.0) + (F.col("doy") % 25).cast("double")).alias("pres"),
        F.when(F.col("doy") % 13 == 0, F.lit(None).cast("double"))
        .otherwise((F.col("doy") % 12).cast("double") * F.lit(30.0))
        .alias("tsun"),
    ).select(*cols)


def combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``combined_data`` — J1: F1 ⋈ weather on (city, country, date), inner.

    Reference site `Lucas files/finalversion:291`. The weather side is
    |cities × dates| ≪ fact side at any scale, so it is explicitly
    broadcast — no shuffle of the fact table on (city, country, date).
    """
    def build() -> DataFrame:
        f1 = f1_results(spark, sf_dir)
        w = weather_daily(spark, sf_dir)
        return f1.join(F.broadcast(w), ["city", "country", "date"], "inner")

    return _staged(spark, sf_dir, "combined", build)


# ---------------------------------------------------------------------------
# DuckDB oracle twin — same derivation in ANSI SQL over the driver's
# pre-registered views (region nation customer supplier orders lineitem).
# Append a final SELECT over `combined` / `f1` / `weather` to use.
# ---------------------------------------------------------------------------

F1_MODEL_CTE = """
WITH f1_src AS (
    SELECT
        l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
        l.l_returnflag, l.l_linestatus,
        o.o_orderdate,
        n.n_name, r.r_name, s.s_name, s.s_nationkey,
        CAST(5400 + (l.l_orderkey % 1800) AS DOUBLE)
          + CAST(l.l_linenumber - 1 AS DOUBLE) * CAST(5.25 AS DOUBLE)
          AS race_secs
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
f1_base AS (
    SELECT
        CAST(year(o_orderdate) AS BIGINT)                 AS year,
        CAST(month(o_orderdate) AS VARCHAR)               AS round,
        n_name || ' Grand Prix'                           AS raceName,
        n_name || ' Circuit'                              AS circuit,
        n_name                                            AS city,
        r_name                                            AS country,
        strftime(o_orderdate, '%Y-%m-%d')                 AS date,
        'driver_' || CAST(l_suppkey AS VARCHAR)           AS driverId,
        s_name                                            AS driverFullName,
        'Constructor ' || CAST(s_nationkey AS VARCHAR)    AS constructorName,
        CAST(CASE l_linenumber WHEN 1 THEN 25 WHEN 2 THEN 18 WHEN 3 THEN 15
             WHEN 4 THEN 12 WHEN 5 THEN 10 WHEN 6 THEN 8 WHEN 7 THEN 6
             ELSE 0 END AS DOUBLE)                        AS points,
        CASE WHEN l_returnflag = 'R' THEN 'N/A'
             ELSE CAST(l_linenumber AS VARCHAR) END       AS position,
        CAST(1 + (l_partkey % 20) AS VARCHAR)             AS grid,
        CAST(50 + (l_orderkey % 25) AS VARCHAR)           AS laps,
        CASE WHEN l_returnflag = 'R' THEN 'Accident'
             WHEN l_linenumber = 1 THEN 'Finished'
             ELSE '+1 Lap' END                            AS status,
        CASE WHEN l_returnflag = 'R' THEN 'N/A'
             ELSE printf('%02d:%02d:%05.2f',
                    CAST(FLOOR(race_secs / 3600.0) AS INTEGER),
                    CAST(FLOOR(fmod(race_secs, 3600.0) / 60.0) AS INTEGER),
                    fmod(race_secs, 60.0)) END            AS time,
        CASE WHEN l_returnflag = 'R' THEN 'N/A'
             WHEN l_returnflag = 'A' AND l_linestatus = 'F' THEN NULL
             ELSE printf('1:%02d.%03d',
                    CAST(7 + (l_partkey % 50) AS INTEGER),
                    CAST((l_suppkey * 7 + l_orderkey) % 1000 AS INTEGER)) END
                                                          AS fastestLapTime,
        CAST(l_linenumber % 4 AS BIGINT)                  AS pitStops,
        l_orderkey                                        AS _rk1,
        l_linenumber                                      AS _rk2,
        l_partkey                                         AS _rk3,
        l_suppkey                                         AS _rk4,
        l_linestatus                                      AS _rk5
    FROM f1_src
),
f1 AS (
    SELECT *,
        CAST(SUM(points) OVER (
            PARTITION BY year, driverId
            ORDER BY date, _rk1, _rk2, _rk3, _rk4, _rk5
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS DOUBLE) AS totalPoints
    FROM f1_base
),
weather_src AS (
    SELECT DISTINCT
        n.n_name                           AS city,
        r.r_name                           AS country,
        strftime(o.o_orderdate, '%Y-%m-%d') AS date,
        n.n_nationkey                      AS nk,
        dayofyear(o.o_orderdate)           AS doy
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE n.n_nationkey % 5 <> 4
),
weather_staged AS (
    SELECT *,
        CAST(nk AS DOUBLE) + CAST(doy % 30 AS DOUBLE) * CAST(0.5 AS DOUBLE)
            - CAST(5.0 AS DOUBLE)                      AS tavg,
        CAST(doy % 15 AS DOUBLE) * CAST(0.75 AS DOUBLE) AS wspd
    FROM weather_src
),
weather AS (
    SELECT
        city, country, date, tavg,
        tavg - CAST(5.25 AS DOUBLE)                    AS tmin,
        tavg + CAST(6.5 AS DOUBLE)                     AS tmax,
        CASE WHEN doy % 3 = 0 THEN CAST(0.0 AS DOUBLE)
             ELSE CAST(doy % 7 AS DOUBLE) * CAST(1.25 AS DOUBLE) END AS prcp,
        CASE WHEN tavg - CAST(5.25 AS DOUBLE) < CAST(0.0 AS DOUBLE)
             THEN CAST(1.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END   AS snow,
        CAST((doy * 7) % 360 AS DOUBLE)                AS wdir,
        wspd,
        CASE WHEN doy % 11 = 0 THEN NULL
             ELSE wspd * CAST(2.0 AS DOUBLE) END       AS wpgt,
        CAST(1000.0 AS DOUBLE) + CAST(doy % 25 AS DOUBLE) AS pres,
        CASE WHEN doy % 13 = 0 THEN NULL
             ELSE CAST(doy % 12 AS DOUBLE) * CAST(30.0 AS DOUBLE) END AS tsun
    FROM weather_staged
),
combined AS (
    SELECT f1.*, w.tavg, w.tmin, w.tmax, w.prcp, w.snow,
           w.wdir, w.wspd, w.wpgt, w.pres, w.tsun
    FROM f1
    JOIN weather w USING (city, country, date)
)
"""
