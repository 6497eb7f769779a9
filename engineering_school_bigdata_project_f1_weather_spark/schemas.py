"""Explicit schemas — the reference inferred every schema
(`Lucas files/finalversion:191,263,279`); we declare them (SURVEY §1.3) so
there is no inference drift and no extra sampling scan jobs.

Two schema families:
1. the driver's TPC-H-ish test tables (TESTDATA.md), and
2. the reference's F1/weather data model (SURVEY §1.2) — golden-parquet
   column types from `Martin files/index/*.parquet`.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Test-lake tables (/root/testdata/sf*/NAME.parquet)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts is INT64 TIMESTAMP(MICROS) parquet; operators/events.py
    # projects it to integer epoch-microseconds (unix_micros) so every
    # arithmetic stays in an exact BIGINT domain shared with the DuckDB
    # oracles (epoch_us).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# ---------------------------------------------------------------------------
# Reference F1/weather model (SURVEY §1.2) — golden column types
# ---------------------------------------------------------------------------

# formatted_ergastF1_data: one row per (race, driver)
# (`Lucas files/finalversion:169-189`). Dates and lap/race times are STRINGS
# by design — the reference's orderings over them are lexicographic
# (SURVEY §2.11 quirk 2) and must stay so.
F1_FORMATTED = T.StructType(
    [
        T.StructField("year", T.LongType()),
        T.StructField("round", T.StringType()),
        T.StructField("raceName", T.StringType()),
        T.StructField("circuit", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("driverId", T.StringType()),
        T.StructField("driverFullName", T.StringType()),
        T.StructField("constructorName", T.StringType()),
        T.StructField("points", T.DoubleType()),
        T.StructField("totalPoints", T.DoubleType()),
        T.StructField("position", T.StringType()),
        T.StructField("grid", T.StringType()),
        T.StructField("laps", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("fastestLapTime", T.StringType()),
        T.StructField("pitStops", T.LongType()),
    ]
)

# METEO2_data_aggregated: one row per (city, date)
# (`Lucas files/finalversion:253-272`; Meteostat daily schema).
WEATHER_DAILY = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("tavg", T.DoubleType()),
        T.StructField("tmin", T.DoubleType()),
        T.StructField("tmax", T.DoubleType()),
        T.StructField("prcp", T.DoubleType()),
        T.StructField("snow", T.DoubleType()),
        T.StructField("wdir", T.DoubleType()),
        T.StructField("wspd", T.DoubleType()),
        T.StructField("wpgt", T.DoubleType()),
        T.StructField("pres", T.DoubleType()),
        T.StructField("tsun", T.DoubleType()),
        T.StructField("country", T.StringType()),
        T.StructField("city", T.StringType()),
    ]
)

WEATHER_METRIC_COLS = [
    "tavg", "tmin", "tmax", "prcp", "snow",
    "wdir", "wspd", "wpgt", "pres", "tsun",
]
