"""Parquet scans of the test lake with explicit schemas.

Replaces the reference's inference-everywhere reads (SURVEY §2.1 S3-S5).
An explicit ``.schema(...)`` keeps the scan single-pass (no sampling job)
and pins column types so Catalyst can push filters/prune columns against a
known layout — at 100 TB an extra inference pass over the footers of
millions of files is real money.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_SCHEMAS

# Mirrors spark.sql.files.{maxPartitionBytes,openCostInBytes} defaults —
# used only for the plan-free scan-task ESTIMATE below, so drift from a
# tuned session conf costs at most one unnecessary (or missed) spread.
_MAX_PARTITION_BYTES = 128 * 1024 * 1024
_OPEN_COST_BYTES = 4 * 1024 * 1024


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test-lake table (TESTDATA.md) with its declared schema."""
    schema = TESTDATA_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(f"{sf_dir}/{name}.parquet")


def _estimated_scan_tasks(df: DataFrame) -> int | None:
    """Plan-free estimate of how many tasks Spark's file-packing will give
    this scan (FilePartition packing: files weighted by size + open cost,
    binned at maxPartitionBytes). Uses only the file listing —
    ``df.rdd.getNumPartitions()`` would materialize the plan's RDD on
    every table read (a real planning job, flagged in VERDICT r3). Returns
    None for non-local files (cluster storage), where scans arrive
    well-split and the spread is a no-op anyway."""
    sizes = []
    for f in df.inputFiles():
        p = urlparse(f)
        if p.scheme not in ("file", ""):
            return None
        try:
            # Hadoop file URIs percent-encode special characters; unquote
            # so paths with spaces/%-chars stat correctly instead of
            # silently disabling the spread (round-4 review).
            sizes.append(os.stat(unquote(p.path)).st_size)
        except OSError:
            return None
    weighted = sum(s + _OPEN_COST_BYTES for s in sizes)
    return max(1, math.ceil(weighted / _MAX_PARTITION_BYTES))


def load_table_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table and guarantee >= defaultParallelism partitions.

    Parquet splits by row group, so a small single-row-group file becomes
    ONE scan task; any CPU-heavy downstream expression (per-token hashing,
    per-vector dots) then runs on one core. The conditional repartition
    spreads such scans; tables that already arrive well-split (the normal
    case at cluster scale) pass through untouched — no extra shuffle.
    """
    df = load_table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    est = _estimated_scan_tasks(df)
    if est is not None and est < target:
        df = df.repartition(target)
    return df
