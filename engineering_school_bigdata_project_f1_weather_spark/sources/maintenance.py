"""Lake-maintenance operations a long-lived 100 TB pipeline needs around
the queries themselves: idempotent backfills, small-file compaction, and
schema evolution. The reference re-runs its whole @monthly DAG and
rewrites every output (`finalversion:429-447`); at scale you rewrite only
the partitions a backfill touches and you compact what streaming ingest
fragmented.

All three are thin, deliberate wrappers over Spark primitives — the value
is pinning the *correct* settings (dynamic partition overwrite, scoped
conf handling, mergeSchema) that are easy to get wrong and destructive
when wrong (static overwrite mode deletes every partition not in the
incoming frame).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_OVERWRITE_MODE = "spark.sql.sources.partitionOverwriteMode"


def backfill_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Idempotent partition backfill: overwrite ONLY the partitions present
    in ``df``, leaving every other partition untouched.

    Uses dynamic partition-overwrite mode, scoped and restored — in the
    default static mode ``mode("overwrite")`` would DELETE all partitions
    not present in ``df``, which turns a one-day backfill into a
    table-wipe. Re-running the same backfill converges to the same state
    (idempotent), which is what a retrying orchestrator needs.
    """
    spark = df.sparkSession
    saved = spark.conf.get(_OVERWRITE_MODE)
    try:
        spark.conf.set(_OVERWRITE_MODE, "dynamic")
        df.write.partitionBy(*partition_by).mode("overwrite").parquet(path)
    finally:
        spark.conf.set(_OVERWRITE_MODE, saved)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    target_files_per_partition: int = 1,
    predicate: str | None = None,
) -> None:
    """Small-file compaction: rewrite (a subset of) a partitioned dataset
    with ``target_files_per_partition`` files per partition.

    Streaming / micro-batch ingest fragments partitions into many small
    files; scans then pay per-file open cost and lose row-group locality.
    Compaction = read back, repartition on the partition keys (so each
    output task owns whole partitions), dynamic-overwrite only the touched
    partitions. ``predicate`` (e.g. ``"day = '2024-01-01'"``) limits the
    rewrite to the partitions that need it — partition pruning makes the
    read cheap.

    Crash safety: the compacted rows are STAGED to a ``._compact_tmp``
    sibling directory first, and only then dynamic-overwritten into
    ``path`` from the staged copy — so the overwrite never reads the very
    directories it is replacing, and the full pre-commit data is durable
    on disk before the first destination partition is dropped. The
    dynamic-overwrite commit itself is still per-partition, not atomic
    (plain parquet directories have no snapshot isolation): a crash
    mid-commit can leave some partitions compacted and others original —
    both states hold the same rows, and the staged copy survives (it is
    only deleted after a successful commit) for re-running the overwrite.
    """
    tmp = path.rstrip("/") + "._compact_tmp"
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.where(predicate)
    compacted = df.repartition(target_files_per_partition, *partition_by)
    compacted.write.partitionBy(*partition_by).mode("overwrite").parquet(tmp)
    backfill_partitions(
        spark.read.parquet(tmp), path, partition_by
    )
    shutil.rmtree(tmp, ignore_errors=True)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of every parquet footer
    under ``path`` (``mergeSchema``) so old files surface new columns as
    NULL. Spark's default reads one footer and silently drops columns
    added later — correct only for frozen schemas."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def partition_file_counts(spark: SparkSession, path: str) -> dict[str, int]:
    """Files per leaf partition directory (compaction observability)."""
    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            out[os.path.relpath(root, path)] = n
    return out
