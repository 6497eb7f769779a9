"""SparkSession factory.

Reference parity notes (SURVEY §2.11): the reference ran Spark 3.5.1 with
ANSI off — Q1's ``WHERE position = 1`` relies on implicit string→int casts
(`Lucas files/finalversion:332`). We keep ANSI off in our own sessions, but
every query builder in this package also works under ANSI-on sessions by
using ``try_cast`` explicitly, so the driver's session config cannot change
results.

Scale posture: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), explicit shuffle partitioning sized to the local core count.
On a real cluster these come from spark-defaults; nothing here hard-codes
local assumptions into query semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "f1weather-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Runtime adaptivity: re-plan joins/partitions from real stats.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local-mode broadcast threshold: the dimension side of the fact
        # joins (orders/customer at bench SF) fits comfortably in memory;
        # broadcasting removes the fact-table shuffle. On a cluster this is
        # a per-deployment setting — AQE still re-plans from runtime stats.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Reference semantics: implicit casts, 'N/A' → NULL, never error.
        .config("spark.sql.ansi.enabled", "false")
        # Deterministic wall-clock formatting of naive parquet timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
