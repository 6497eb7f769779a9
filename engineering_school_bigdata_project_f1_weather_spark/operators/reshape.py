"""Reshape + set-operation surface (SURVEY §2.10 gap-fill): pivot (long →
wide), melt/unpivot (wide → long), INTERSECT / EXCEPT — the remaining
canonical DataFrame shapes no other module exercises.

- ``events_pivot``   : hourly × event-type count matrix via
  ``groupBy().pivot(values=...)`` — the value list is pinned so the plan
  is a single pass (no extra distinct-scan to discover columns) and the
  output schema is deterministic for the oracle.
- ``weather_melt``   : the weather daily wide row melted to (metric,
  value) long form via ``unpivot`` — the normalization direction the
  serving layer wants for generic metric dashboards.
- ``segment_overlap``: INTERSECT / EXCEPT DISTINCT over customer key sets
  (high-value vs recent buyers) — count summary of both directions plus
  the intersection.

Scale notes: a pinned-values pivot is one partial+final aggregate (each
value becomes a conditional agg column — map-side combinable); melt is a
narrow 1:N expand; INTERSECT/EXCEPT hash-shuffle both sides once on the
full row key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .events import HOUR_US, load_events
from ..sources.tables import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # pinned

WEATHER_METRICS = ["temp_min", "temp_max", "temp_avg", "precipitation", "wspd"]

OVERLAP_PRICE_MIN = 200_000.0
OVERLAP_DATE_MIN = "1999-01-01"


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour × event-type count matrix (long → wide). ``pivot`` with the
    value list PINNED: Spark skips the values-discovery job and plans one
    aggregate whose output columns are stable for the oracle."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy((F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def _pivot_oracle_sql() -> str:
    cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {t}"
        for t in EVENT_TYPES
    )
    return f"""
        SELECT epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us,
               {cols}
        FROM events GROUP BY 1
    """


def weather_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4's wide per-(year, city, driver) weather row melted to
    (metric, value_e2) long form — ``unpivot``/melt, with values quantized
    to integer centi-units so the oracle hash is exact."""
    from .marts import q4_weather

    wide = q4_weather(spark, sf_dir)
    melted = wide.unpivot(
        ids=["year", "city", "driverFullName"],
        values=WEATHER_METRICS,
        variableColumnName="metric",
        valueColumnName="value",
    )
    return melted.select(
        "year",
        "city",
        "driverFullName",
        "metric",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("value_e2"),
    )


def _melt_oracle_sql() -> str:
    from .marts import ORACLE_SQL as MARTS_ORACLE

    arms = " UNION ALL ".join(
        f"SELECT year, city, driverFullName, '{m}' AS metric, "
        f"CAST(FLOOR({m} * 100.0 + 0.5) AS BIGINT) AS value_e2 FROM wide"
        for m in WEATHER_METRICS
    )
    return f"WITH wide AS ({MARTS_ORACLE['q4_weather']}) {arms}"


def segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over two customer key sets: high-value customers
    (an order above OVERLAP_PRICE_MIN) vs recent customers (an order after
    OVERLAP_DATE_MIN). Output: one row per set relation with its size."""
    o = load_table(spark, sf_dir, "orders")
    high = o.where(F.col("o_totalprice") > OVERLAP_PRICE_MIN).select(
        "o_custkey"
    ).distinct()
    recent = o.where(F.col("o_orderdate") >= OVERLAP_DATE_MIN).select(
        "o_custkey"
    ).distinct()

    def _count(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("relation"),
            F.count(F.lit(1)).alias("n_customers"),
        )

    return (
        _count(high.intersect(recent), "both")
        .unionByName(_count(high.exceptAll(recent), "high_only"))
        .unionByName(_count(recent.exceptAll(high), "recent_only"))
        .orderBy("relation")
    )


def _overlap_oracle_sql() -> str:
    return f"""
    WITH high AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_totalprice > {OVERLAP_PRICE_MIN}
    ),
    recent AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= DATE '{OVERLAP_DATE_MIN}'
    )
    SELECT 'both' AS relation, COUNT(*) AS n_customers
    FROM (SELECT * FROM high INTERSECT SELECT * FROM recent)
    UNION ALL
    SELECT 'high_only', COUNT(*)
    FROM (SELECT * FROM high EXCEPT SELECT * FROM recent)
    UNION ALL
    SELECT 'recent_only', COUNT(*)
    FROM (SELECT * FROM recent EXCEPT SELECT * FROM high)
    ORDER BY relation
    """


QUERIES = {
    "events_pivot": events_pivot,
    "weather_melt": weather_melt,
    "segment_overlap": segment_overlap,
}

ORACLE_SQL = {
    "events_pivot": _pivot_oracle_sql(),
    "weather_melt": _melt_oracle_sql(),
    "segment_overlap": _overlap_oracle_sql(),
}
