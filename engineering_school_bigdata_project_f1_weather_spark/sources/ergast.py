"""Ergast F1 raw-JSON ingestion → the formatted race-driver table.

Replaces the reference's driver-side normalization loop
(`Lucas files/finalversion:107-192`, SURVEY §2.1 S4) with a distributed
plan over the raw zone:

- nested-JSON scans with explicit schemas (no inference) + ``explode`` of
  ``MRData.RaceTable.Races[].Results[]`` — executor-side, scales with the
  raw zone instead of driver RAM;
- year/round recovered from the file path (``input_file_name`` regex) —
  the lake layout carries them, exactly like the reference's filename
  convention ``results_{year}_{round}.json``;
- T8 winner-delta reconstruction as a window (`finalversion:140,153-165`):
  the winner's absolute 'H:MM:SS.s' time is broadcast over the (year,
  round) partition and '+gap' rows become winner+gap;
- A5 pit-stop counts as a groupBy (`finalversion:133-138`);
- A6 cumulative championship points as a running-sum window
  (`finalversion:146-147`).

Raw-zone layout expected: ``{raw_dir}/races_{year}_{round}.json``,
``results_{year}_{round}.json``, ``pitstops_{year}_{round}.json`` — one
JSON document per file (the REST response bodies), hence ``multiLine``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T

from ..functions.times import format_hms, parse_seconds
from ..schemas import F1_FORMATTED

# --- raw JSON schemas (explicit — SURVEY §1.3) -----------------------------

RACE_META_SCHEMA = T.StructType(
    [
        T.StructField("round", T.StringType()),
        T.StructField("raceName", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField(
            "Circuit",
            T.StructType(
                [
                    T.StructField("circuitId", T.StringType()),
                    T.StructField("circuitName", T.StringType()),
                ]
            ),
        ),
        T.StructField("city", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

_RESULT = T.StructType(
    [
        T.StructField(
            "Driver",
            T.StructType(
                [
                    T.StructField("driverId", T.StringType()),
                    T.StructField("givenName", T.StringType()),
                    T.StructField("familyName", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "Constructor",
            T.StructType([T.StructField("name", T.StringType())]),
        ),
        T.StructField("points", T.StringType()),
        T.StructField("position", T.StringType()),
        T.StructField("grid", T.StringType()),
        T.StructField("laps", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField(
            "Time", T.StructType([T.StructField("time", T.StringType())])
        ),
        T.StructField(
            "FastestLap",
            T.StructType(
                [
                    T.StructField(
                        "Time",
                        T.StructType([T.StructField("time", T.StringType())]),
                    )
                ]
            ),
        ),
    ]
)

RESULTS_SCHEMA = T.StructType(
    [
        T.StructField(
            "MRData",
            T.StructType(
                [
                    T.StructField(
                        "RaceTable",
                        T.StructType(
                            [
                                T.StructField(
                                    "Races",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "Results", T.ArrayType(_RESULT)
                                                )
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)

PITSTOPS_SCHEMA = T.StructType(
    [
        T.StructField(
            "MRData",
            T.StructType(
                [
                    T.StructField(
                        "RaceTable",
                        T.StructType(
                            [
                                T.StructField(
                                    "Races",
                                    T.ArrayType(
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "PitStops",
                                                    T.ArrayType(
                                                        T.StructType(
                                                            [
                                                                T.StructField(
                                                                    "driverId",
                                                                    T.StringType(),
                                                                ),
                                                                T.StructField(
                                                                    "stop",
                                                                    T.StringType(),
                                                                ),
                                                                T.StructField(
                                                                    "lap",
                                                                    T.StringType(),
                                                                ),
                                                                T.StructField(
                                                                    "time",
                                                                    T.StringType(),
                                                                ),
                                                                T.StructField(
                                                                    "duration",
                                                                    T.StringType(),
                                                                ),
                                                            ]
                                                        )
                                                    ),
                                                )
                                            ]
                                        )
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)


def _year_round(pattern: str) -> list[F.Column]:
    fn = F.input_file_name()
    return [
        F.regexp_extract(fn, pattern, 1).cast("long").alias("year"),
        F.regexp_extract(fn, pattern, 2).alias("round"),
    ]


def read_race_meta(spark: SparkSession, raw_dir: str) -> DataFrame:
    """races_{year}_{round}.json → (year, round, raceName, circuit, city,
    country, date)."""
    df = (
        spark.read.schema(RACE_META_SCHEMA)
        .option("multiLine", True)
        .option("pathGlobFilter", "races_*.json")
        .json(raw_dir)
    )
    return df.select(
        *_year_round(r"races_(\d+)_(\d+)\.json"),
        F.col("raceName"),
        F.col("Circuit.circuitName").alias("circuit"),
        F.col("city"),
        F.col("country"),
        F.col("date"),
    )


def read_results(spark: SparkSession, raw_dir: str) -> DataFrame:
    """results_{year}_{round}.json → one row per race-driver result."""
    df = (
        spark.read.schema(RESULTS_SCHEMA)
        .option("multiLine", True)
        .option("pathGlobFilter", "results_*.json")
        .json(raw_dir)
    )
    return (
        df.select(
            *_year_round(r"results_(\d+)_(\d+)\.json"),
            F.explode(F.col("MRData.RaceTable.Races")).alias("race"),
        )
        .select("year", "round", F.explode("race.Results").alias("res"))
        .select(
            "year",
            "round",
            F.col("res.Driver.driverId").alias("driverId"),
            # T9: string concat (`finalversion:143`)
            F.concat_ws(
                " ", F.col("res.Driver.givenName"), F.col("res.Driver.familyName")
            ).alias("driverFullName"),
            F.col("res.Constructor.name").alias("constructorName"),
            F.col("res.points").cast("double").alias("points"),
            F.coalesce(F.col("res.position"), F.lit("N/A")).alias("position"),
            F.coalesce(F.col("res.grid"), F.lit("N/A")).alias("grid"),
            F.coalesce(F.col("res.laps"), F.lit("N/A")).alias("laps"),
            F.coalesce(F.col("res.status"), F.lit("N/A")).alias("status"),
            F.col("res.Time.time").alias("raw_time"),
            F.coalesce(F.col("res.FastestLap.Time.time"), F.lit("N/A")).alias(
                "fastestLapTime"
            ),
        )
    )


def read_pitstop_counts(spark: SparkSession, raw_dir: str) -> DataFrame:
    """A5: pit stops per (year, round, driverId) — distributed groupBy
    instead of the reference's driver dict (`finalversion:133-138`)."""
    df = (
        spark.read.schema(PITSTOPS_SCHEMA)
        .option("multiLine", True)
        .option("pathGlobFilter", "pitstops_*.json")
        .json(raw_dir)
    )
    return (
        df.select(
            *_year_round(r"pitstops_(\d+)_(\d+)\.json"),
            F.explode_outer(F.col("MRData.RaceTable.Races")).alias("race"),
        )
        .select("year", "round", F.explode_outer("race.PitStops").alias("ps"))
        .where(F.col("ps").isNotNull())
        .groupBy("year", "round", F.col("ps.driverId").alias("driverId"))
        .agg(F.count(F.lit(1)).alias("pitStops"))
    )


def normalize(spark: SparkSession, raw_dir: str) -> DataFrame:
    """Full P1 normalization: raw JSON → F1_FORMATTED table.

    Every reference driver-loop behavior is reproduced as a distributed
    operator; see module docstring. Output column set/types match
    ``schemas.F1_FORMATTED`` (golden parquet parity).
    """
    results = read_results(spark, raw_dir)
    meta = read_race_meta(spark, raw_dir)
    pits = read_pitstop_counts(spark, raw_dir)

    # T8: winner-delta reconstruction. The winner is position '1'; their
    # absolute time seeds '+gap' rows (`finalversion:140,153-165`).
    race_w = Window.partitionBy("year", "round").orderBy(
        F.expr("try_cast(position AS INT)").asc_nulls_last(), "driverId"
    )
    secs = parse_seconds(F.col("raw_time"))
    winner_secs = F.first(secs, ignorenulls=False).over(race_w)
    abs_secs = (
        F.when(F.col("raw_time").isNull(), F.lit(None).cast("double"))
        .when(F.col("raw_time").startswith("+"), winner_secs + secs)
        .otherwise(secs)
    )
    timed = results.withColumn("time", format_hms(abs_secs))

    # A6: cumulative points per (year, driverId) in numeric round order
    # (`finalversion:146-147`; quirk 5).
    cum_w = (
        Window.partitionBy("year", "driverId")
        .orderBy(F.col("round").cast("int"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = timed.withColumn("totalPoints", F.sum("points").over(cum_w))

    # join race metadata (small: one row per race → broadcast) and A5 counts
    out = (
        cum.join(F.broadcast(meta), ["year", "round"], "left")
        .join(pits, ["year", "round", "driverId"], "left")
        .na.fill(0, ["pitStops"])
    )
    cols = [f.name for f in F1_FORMATTED.fields]
    return out.select(*cols)
