"""Misra-Gries heavy hitters: the interesting regime is capacity ≪
distinct keys, which the sf testdata (150 users) never hits — these
tests build a skewed synthetic frame with thousands of distinct keys and
a handful of heavy ones, and pin (a) the mergeable-summaries superset
guarantee, (b) end-to-end exactness of the two-pass operator against a
plain exact groupBy, and (c) that the sketch actually prunes (candidate
set ≪ distinct keys)."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from engineering_school_bigdata_project_f1_weather_spark.operators import sketch


def _skewed_df(spark, n_heavy=5, heavy_cnt=500, n_light=4000, parts=8):
    """5 keys with 500 rows each + 4000 singleton keys: 6500 rows,
    4005 distinct. With capacity 32, threshold is 6500/33 ≈ 197 — the
    heavy 5 qualify, nothing else comes close."""
    heavy = spark.range(n_heavy * heavy_cnt).select(
        (F.col("id") % n_heavy).alias("key")
    )
    light = spark.range(n_light).select((F.col("id") + 1_000_000).alias("key"))
    return heavy.unionAll(light).repartition(parts)


def test_two_pass_heavy_hitters_exact_under_pruning(spark):
    cap = 32
    df = _skewed_df(spark)
    cand = sketch.mg_candidates(df, "key", cap)
    n_cand = cand.count()
    # The sketch must prune hard: ≤ cap × partitions candidates out of
    # 4005 distinct keys.
    assert n_cand <= cap * 8
    assert n_cand < 4005
    n = df.count()
    exact = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * (cap + 1) > F.lit(n))
    )
    got = (
        df.join(F.broadcast(cand.select("key")), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * (cap + 1) > F.lit(n))
    )
    assert sorted(r["key"] for r in got.collect()) == sorted(
        r["key"] for r in exact.collect()
    ) == [0, 1, 2, 3, 4]


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=2, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_mg_merge_superset_guarantee(values, cap):
    """Pure-python property: after merging arbitrary batches into a
    capacity-C summary, every key with count > n/(C+1) is present, and
    the summary never exceeds C keys."""
    counters: dict = {}
    # split into two arbitrary batches to exercise the merge path
    mid = len(values) // 2
    for chunk in (values[:mid], values[mid:]):
        if chunk:
            counters = sketch._mg_merge(counters, pd.Series(chunk), cap)
    assert len(counters) <= cap
    n = len(values)
    exact = pd.Series(values).value_counts()
    for key, cnt in exact.items():
        if cnt * (cap + 1) > n:
            assert key in counters


def test_events_heavy_hitters_matches_exact(spark, sf_dir):
    got = sketch.events_heavy_hitters(spark, sf_dir).collect()
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import load_events

    e = load_events(spark, sf_dir)
    n = e.count()
    exact = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") * (sketch.MG_CAPACITY + 1) > F.lit(n))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]
