"""Sketch-based EXACT heavy hitters (two-pass Misra-Gries).

Extension surface (the reference — Martin-JMP F1/Weather — has no
frequency-sketch analytics; its only "top" queries are full groupBy +
sort, e.g. ``spark_analysis.py``'s win counts). This is the operator a
100 TB pipeline needs when the key cardinality itself is the problem:
"which user_ids account for more than 1/(C+1) of all traffic" over a
key domain with billions of distinct values, where a full
``groupBy(key).count()`` shuffle materializes one row per distinct key.

Two passes, both scale-bounded:

1. **Candidate generation** — a Misra-Gries summary of capacity ``C``
   per input partition (Arrow-batched ``mapInPandas``; the summary dict
   lives across the partition's batches, updates are vectorized
   ``value_counts`` merges).  The MG merge bound (Agarwal et al.,
   "Mergeable Summaries", PODS'12): a summary of capacity C undercounts
   any key by at most n_p/(C+1) of the n_p rows it summarized, and
   merging summaries adds the bounds.  So any key with TOTAL count
   > N/(C+1) survives in at least one partition summary — the union of
   the per-partition summaries is a superset of the true heavy hitters.
   Output is ≤ C rows per partition regardless of data size — the
   shuffle after this pass carries sketch rows, not data rows.
2. **Exact verify** — broadcast-semi-join the candidate set back onto
   the fact table and count exactly; partial aggregation means the heavy
   keys (which is all of them, by construction) combine map-side, so the
   final shuffle is ≤ |candidates| rows.  Filter ``cnt * (C+1) > N``
   with N as an in-plan one-row aggregate (no driver-side count).

The emitted result is therefore EXACT — identical to the oracle's
``GROUP BY key HAVING cnt*(C+1) > N`` — while the plan never shuffles
more than O(C × partitions) sketch rows plus one map-combined count.
At sf0.01 the 150-user key domain fits inside one summary (the sketch
never decrements); tests/test_sketch.py pins the interesting regime —
capacity ≪ distinct keys on a skewed synthetic frame — against exact
counts, plus the superset guarantee property.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .events import load_events

MG_CAPACITY = 128  # C: summary size; guarantee threshold is N/(C+1)


def _mg_merge(counters: dict, batch: pd.Series, capacity: int) -> dict:
    """Merge a batch's value counts into a Misra-Gries summary of the
    given capacity: add counts, and if the summary overflows, subtract
    the (capacity+1)-th largest count from every key and drop the keys
    that hit zero (the standard mergeable-summaries step — equivalent to
    running the decrement rule once per subtracted unit)."""
    for key, cnt in batch.value_counts().items():
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > capacity:
        cut = sorted(counters.values(), reverse=True)[capacity]
        counters = {k: v - cut for k, v in counters.items() if v > cut}
    return counters


def _mg_partition(
    it: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Per-partition MG sketch over the single ``key`` column; emits the
    surviving candidate keys (≤ capacity rows) once the partition's
    batches are exhausted."""
    counters: dict = {}
    for pdf in it:
        counters = _mg_merge(counters, pdf["key"], capacity)
    yield pd.DataFrame({"key": pd.Series(list(counters), dtype="int64")})


def mg_candidates(df: DataFrame, key: str, capacity: int) -> DataFrame:
    """Distinct union of the per-partition Misra-Gries summaries for
    ``df[key]`` — a superset of every key with total count
    > N/(capacity+1), in ≤ capacity × num_partitions rows."""
    keyed = df.select(F.col(key).alias("key"))
    cand = keyed.mapInPandas(
        lambda it: _mg_partition(it, capacity), "key bigint"
    )
    return cand.distinct().select(F.col("key").alias(key))


def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users contributing > 1/(C+1) of all events, computed exactly via
    the two-pass MG sketch (module docstring). Output: (user_id,
    n_events) for each heavy hitter, heaviest first."""
    e = load_events(spark, sf_dir).select("user_id")
    cand = mg_candidates(e, "user_id", MG_CAPACITY)
    n_total = e.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        e.join(F.broadcast(cand), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        exact.crossJoin(F.broadcast(n_total))
        .where(F.col("n_events") * (MG_CAPACITY + 1) > F.col("n_total"))
        .select("user_id", "n_events")
        .orderBy(F.desc("n_events"), F.asc("user_id"))
    )


_HH_ORACLE = f"""
WITH tot AS (SELECT COUNT(*) AS n_total FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
HAVING COUNT(*) * {MG_CAPACITY + 1} > (SELECT n_total FROM tot)
ORDER BY n_events DESC, user_id ASC
"""


QUERIES = {
    "events_heavy_hitters": events_heavy_hitters,
}

ORACLE_SQL = {
    "events_heavy_hitters": _HH_ORACLE,
}
