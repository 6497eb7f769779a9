"""Meteostat raw-CSV ingestion → the per-(city, date) weather table.

Replaces the reference's 24 per-city ``read.csv(inferSchema)`` calls +
iterative union (`Lucas files/finalversion:253-272`, SURVEY S3/T5/U1) with:

- ONE schema'd glob scan (``pathGlobFilter=METEO2_data_*.csv``) — no
  inference sampling jobs, one file listing, arbitrarily many cities;
- the city recovered from the file path (``input_file_name`` regex) instead
  of 24 hard-coded ``lit()`` columns;
- the country from a broadcast station-dimension join (SURVEY §1.3) —
  the scalable form of the reference's per-file literals.

``union_cities`` keeps the reference's U1 shape (explicit per-city frames →
``unionByName`` fold) for parity/testing; ``read_weather`` is the engine
path.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import WEATHER_DAILY

# Raw Meteostat daily CSV columns (`finalversion:242-245`): date kept as a
# string — the reference's join key and orderings are string-typed
# (SURVEY quirk 4).
WEATHER_CSV_SCHEMA = T.StructType(
    [T.StructField("date", T.StringType())]
    + [
        T.StructField(c, T.DoubleType())
        for c in ["tavg", "tmin", "tmax", "prcp", "snow", "wdir", "wspd", "wpgt", "pres", "tsun"]
    ]
)


def read_weather(
    spark: SparkSession, raw_dir: str, stations: DataFrame
) -> DataFrame:
    """P2: raw per-city CSVs → WEATHER_DAILY (one glob scan + dim join).

    ``stations`` is the (city, country) dimension — tiny, broadcast.
    """
    df = (
        spark.read.schema(WEATHER_CSV_SCHEMA)
        .option("header", True)
        .option("pathGlobFilter", "METEO2_data_*.csv")
        .csv(raw_dir)
        .withColumn(
            "city",
            F.regexp_extract(F.input_file_name(), r"METEO2_data_(.+)\.csv", 1),
        )
    )
    out = df.join(F.broadcast(stations), "city", "left")
    return out.select(*[f.name for f in WEATHER_DAILY.fields])


def stream_weather(
    spark: SparkSession, raw_dir: str, stations: DataFrame
) -> DataFrame:
    """S3 as continuous ingest: the same schema'd CSV scan + broadcast dim
    join as :func:`read_weather`, but as a file-source STREAM — new
    per-city drops land incrementally (one micro-batch per file with
    maxFilesPerTrigger=1, mirroring the reference's per-city loop as
    arrival order instead of driver iteration). Identical projection, so
    batch/stream parity is testable row-for-row."""
    df = (
        spark.readStream.schema(WEATHER_CSV_SCHEMA)
        .option("header", True)
        .option("pathGlobFilter", "METEO2_data_*.csv")
        .option("maxFilesPerTrigger", "1")
        .csv(raw_dir)
        .withColumn(
            "city",
            F.regexp_extract(F.input_file_name(), r"METEO2_data_(.+)\.csv", 1),
        )
    )
    out = df.join(F.broadcast(stations), "city", "left")
    return out.select(*[f.name for f in WEATHER_DAILY.fields])


def union_cities(frames: list[DataFrame]) -> DataFrame:
    """U1 parity: fold per-city frames with unionByName (the reference used
    positional union — by-name is drift-proof; Catalyst flattens either)."""
    return reduce(DataFrame.unionByName, frames)


def combine(f1: DataFrame, weather: DataFrame) -> DataFrame:
    """P3/J1: inner equi-join on (city, country, date), weather broadcast
    (`Lucas files/finalversion:291`)."""
    return f1.join(F.broadcast(weather), ["city", "country", "date"], "inner")
