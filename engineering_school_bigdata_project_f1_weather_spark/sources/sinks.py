"""Sinks: the lake-writing side of the pipeline (SURVEY §2.1 S6-S9).

- ``write_parquet``    : zone writer. The reference coalesced every output
  to one file (`finalversion:192,272,292` — quirk 9, an anti-scale choice
  that serializes the final stage); here natural partitioning is the
  default and ``compat_single_file=True`` opts into the byte-layout-
  compatible single file.
- ``write_mart``       : usage-zone writer with the reference's mart names.
  Fixes quirk 7 (`finalversion:389` writes the *filter* mart into the
  fastest-lap folder) behind ``preserve_path_bug``.
- ``csv_to_parquet``   : P6 utility (`finalversion:274-281`).
- ``foreach_partition_sink``: the S8/S9 Elasticsearch-shaped sink as a
  partition-parallel callback (HTTP clients per partition, never through
  the driver). The reference's ES bulk loader read marts into pandas on one
  machine; this shape ships each partition independently.

Lake layout (SURVEY §1.1): ``<zone>/<dataset>/<YYYYMMDD>/`` date-partitioned
directories; at scale ``partitionBy`` gives Hive-style partition pruning.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MART_NAMES = [
    "wins", "fastestlap", "filter", "weather2324",
    "evopoints", "constructor", "pitstop", "stats", "top10",
]


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compat_single_file: bool = False,
) -> None:
    w = df.coalesce(1).write if compat_single_file else df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(path)


def mart_path(usage_dir: str, name: str, preserve_path_bug: bool = False) -> str:
    """Usage-zone path for a mart. quirk 7: the reference wrote the filter
    mart under analysis_2 (fastest lap) because FILTER_OUTPUT_FOLDER went
    unused; ``preserve_path_bug=True`` reproduces that mapping."""
    idx = MART_NAMES.index(name) + 1
    if preserve_path_bug and name == "filter":
        idx = MART_NAMES.index("fastestlap") + 1
    return f"{usage_dir}/analysis_{idx}/{name}.parquet"


def write_mart(
    df: DataFrame,
    usage_dir: str,
    name: str,
    compat_single_file: bool = False,
    preserve_path_bug: bool = False,
) -> str:
    path = mart_path(usage_dir, name, preserve_path_bug)
    write_parquet(df, path, compat_single_file=compat_single_file)
    return path


def csv_to_parquet(
    spark: SparkSession, csv_path: str, parquet_path: str, schema=None
) -> None:
    """P6: CSV→parquet conversion utility (`finalversion:274-281`) — with an
    explicit schema instead of inference when one is supplied."""
    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema is not None else reader.option(
        "inferSchema", True
    )
    reader.csv(csv_path).write.mode("overwrite").parquet(parquet_path)


def serving_prep(df: DataFrame, drop_cols: tuple[str, ...] = ("best_lap_time",), fill=0) -> DataFrame:
    """Pre-serving cleanup (T10/T11, `Martin files/elsastic parquet.py:22,26`):
    null-fill then drop the columns the serving layer excludes."""
    return df.na.fill(fill).drop(*drop_cols)


def foreach_partition_sink(
    df: DataFrame, send: Callable[[Iterator[dict[str, Any]]], None]
) -> None:
    """S8-shaped serving sink: ``send`` receives each partition's rows as
    dicts (e.g. an Elasticsearch ``helpers.bulk`` call per partition).
    Executor-side and partition-parallel — the driver never materializes
    the mart (unlike `Code Big Data Project.py:405-454`)."""
    df.foreachPartition(lambda rows: send(r.asDict() for r in rows))
