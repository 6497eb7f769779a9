"""Parquet scans of the test lake with explicit schemas.

Replaces the reference's inference-everywhere reads (SURVEY §2.1 S3-S5).
An explicit ``.schema(...)`` keeps the scan single-pass (no sampling job)
and pins column types so Catalyst can push filters/prune columns against a
known layout — at 100 TB an extra inference pass over the footers of
millions of files is real money.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test-lake table (TESTDATA.md) with its declared schema."""
    schema = TESTDATA_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(f"{sf_dir}/{name}.parquet")


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
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df
