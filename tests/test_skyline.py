"""Skyline edge-case semantics on a hand-built frame: duplicate Pareto
points both survive (neither dominates the other), same-date non-max
rows are dominated, and a later-date point survives only with a
strictly higher price."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window


def _skyline(spark, rows):
    """Run the same relational rewrite as analytics.orders_skyline on an
    explicit (key, ts, cents) frame."""
    o = spark.createDataFrame(rows, "k bigint, ts_us bigint, cents bigint")
    per = o.groupBy("ts_us").agg(F.max("cents").alias("dmax"))
    w = Window.orderBy("ts_us").rowsBetween(Window.unboundedPreceding, -1)
    per = per.withColumn("pmax", F.max("dmax").over(w))
    return sorted(
        r["k"]
        for r in o.join(per, "ts_us")
        .where(
            (F.col("cents") == F.col("dmax"))
            & (F.col("pmax").isNull() | (F.col("cents") > F.col("pmax")))
        )
        .collect()
    )


def test_skyline_duplicates_and_dominance(spark):
    rows = [
        (1, 10, 100),  # frontier (earliest date, max price on it)
        (2, 10, 100),  # exact duplicate of 1 — both survive
        (3, 10, 50),   # same date, lower price — dominated by 1
        (4, 20, 100),  # later date, equal price — dominated by 1
        (5, 20, 150),  # later date, strictly higher price — frontier
        (6, 30, 150),  # later date, equal to 5 — dominated
        (7, 30, 160),  # frontier
    ]
    assert _skyline(spark, rows) == [1, 2, 5, 7]


def test_skyline_single_and_monotone(spark):
    assert _skyline(spark, [(1, 5, 7)]) == [1]
    # strictly improving prices: everything survives
    rows = [(k, k, k * 10) for k in range(1, 6)]
    assert _skyline(spark, rows) == [1, 2, 3, 4, 5]
    # strictly worsening prices over time: only the first survives
    rows = [(k, k, 100 - k) for k in range(1, 6)]
    assert _skyline(spark, rows) == [1]
