"""Event-stream analytics over the ``events`` table (batch side; the
Structured Streaming ingest of the same table lives in ``streaming/``).

- ``events_hourly``     : tumbling-window aggregation (epoch-aligned hour).
- ``events_sessionize`` : gaps-and-islands sessionization (30-min gap) via
                          lag + running-sum windows — the batch equivalent
                          of a session_window streaming agg.
- ``events_json``       : JSON scalar extraction from the ``props`` column.

Time domain: the parquet stores INT64 TIMESTAMP(MICROS); we project to
**integer epoch-microseconds** (`unix_micros(ts)`), the same exact BIGINT
DuckDB's `epoch_us(ts)` produces. All outputs stay in that integer
domain, which is also timezone-proof: no session-tz dependence in either
engine.

Monetary/double sums are quantized to integer cents
(``floor(value * 100 + 0.5)``) so aggregates are exact and
order-independent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..schemas import TESTDATA_SCHEMAS

HOUR_US = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (epoch micros, bigint) added — no session
    side effects, the schema is declared and the conversion is a pure
    projection (``unix_micros`` is timezone-independent)."""
    df = spark.read.schema(TESTDATA_SCHEMAS["events"]).parquet(
        f"{sf_dir}/events.parquet"
    )
    return df.withColumn("ts_us", F.unix_micros("ts"))


def _cents(col: str) -> F.Column:
    return F.floor(F.col(col) * 100.0 + F.lit(0.5)).cast("long")


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation per event type — partial+final hash agg,
    shuffle keyed on (hour, type)."""
    e = load_events(spark, sf_dir)
    return (
        e.withColumn("value_cents", _cents("value"))
        .groupBy(
            (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("value_cents_sum"),
            F.min("event_id").alias("first_event_id"),
        )
    )


def events_hourly_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup MAINTENANCE: merge a new batch's partial
    aggregates into an existing hourly rollup without touching history —
    the incremental-view-update shape a 100 TB pipeline uses instead of
    recomputing a world-sized groupBy every ingest cycle.

    The rollup state here is (n_events, value_cents_sum, first_event_id)
    — a sum, a sum, and a min: all ASSOCIATIVE, so merging = unionByName
    + re-aggregate over just (old rollup ∪ new batch partials), touching
    |rollup| + |batch| rows, never the raw history. The fixture splits
    events into "already rolled up" (even event_id) and "new batch"
    (odd); the merged result must be bit-identical to
    :func:`events_hourly` over the whole table — same oracle, which IS
    the algebraic-merge proof.
    """
    e = load_events(spark, sf_dir).withColumn("value_cents", _cents("value"))

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("value_cents_sum"),
            F.min("event_id").alias("first_event_id"),
        )

    existing = rollup(e.where(F.col("event_id") % 2 == 0))
    batch = rollup(e.where(F.col("event_id") % 2 != 0))
    return (
        existing.unionByName(batch)
        .groupBy("hour_us", "event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents_sum").cast("long").alias("value_cents_sum"),
            F.min("first_event_id").alias("first_event_id"),
        )
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a new session starts after a >30-min silence.

    lag + cumulative-sum windows partitioned by user — each user's events
    shuffle to one partition group; no driver-side state. (Streaming
    equivalent: session_window in streaming/events_stream.py.)
    """
    e = load_events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_us").over(order).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(order) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_seq", F.sum("new_sess").over(running))
    return (
        sess.withColumn("value_cents", _cents("value"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("value_cents_sum"),
        )
    )


def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (`props` → `$.k`) + grouped aggregation."""
    e = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


ANOMALY_K2 = 9  # flag |z| > 3 (compared as z² > 9, exactly, in integers)


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomaly detection per event type — a 3σ z-test done
    ENTIRELY in integer arithmetic so the oracle matches bit-for-bit:

        z² > K²  ⇔  (m·c − S)² > K² · (m·S2 − S²)

    with m = #hours for the type, S = Σ counts, S2 = Σ counts² (population
    variance; both sides exact integers — no float mean/stddev anywhere).
    The squared terms are computed in DECIMAL(38,0): at real scale
    (m·c ~ 1e10) the square overflows BIGINT, and with ANSI off Spark
    would wrap silently while DuckDB widens to HUGEINT — the one
    cross-engine drift this operator family is designed to avoid.

    Plan: the hourly rollup (one shuffle) → per-type stats via window
    (second shuffle on event_type) → narrow flag projection.
    """
    hourly = (
        load_events(spark, sf_dir)
        .groupBy(
            (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    by_type = Window.partitionBy("event_type")
    stats = (
        hourly.withColumn("m", F.count(F.lit(1)).over(by_type))
        .withColumn("s", F.sum("n_events").over(by_type))
        .withColumn("s2", F.sum(F.col("n_events") * F.col("n_events")).over(by_type))
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # cast BEFORE multiplying — the whole point is that the products must
    # not pass through BIGINT
    lhs = dec("m") * dec("n_events") - dec("s")
    rhs = dec("m") * dec("s2") - dec("s") * dec("s")
    return stats.select(
        "event_type",
        "hour_us",
        "n_events",
        "m",
        "s",
        (lhs * lhs > F.lit(ANOMALY_K2) * rhs).alias("is_anomaly"),
    )


FUNNEL_STEPS = ["view", "click", "purchase"]


FUNNEL_WINDOW_US = 6 * 3600 * 1_000_000  # max gap between funnel steps


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED funnel at EVENT grain — the MATCH_RECOGNIZE /
    sequential-pattern shape ``events_funnel`` can't express: a click
    counts only with a view at most 6 h before it, a purchase only with
    a QUALIFYING click at most 6 h before it (existential semantics —
    any in-window predecessor qualifies, not just the user's first).

    Why two chained carries implement the existential check exactly:
    "∃ view in [c − W, c]" ⟺ "the LATEST view ≤ c is ≥ c − W" (the max
    argument, same as events_attribution) — so pass 1 carries the
    latest view timestamp per user and click rows test it; pass 2
    carries the latest QUALIFYING-click timestamp (a pass-1 result) and
    purchase rows test that. Both passes share ONE user-keyed sort
    (same window spec ⇒ one exchange, two window operators); step ties
    at equal ts resolve view < click < purchase so the inclusive ≤
    chain is deterministic. No joins, no per-row range probing.

    Output: one row per step with the matched EVENT count and the ratio
    to step 1 (event grain keeps the funnel non-degenerate — at user
    grain every user in this fixture eventually converts).

    The ORACLE is the definitional EXISTS form (a correlated in-window
    predecessor per event), so the hash gate proves carry ≡ exists."""
    e = load_events(spark, sf_dir).where(
        F.col("event_type").isin(*FUNNEL_STEPS)
    )
    prio = (
        F.when(F.col("event_type") == FUNNEL_STEPS[0], 0)
        .when(F.col("event_type") == FUNNEL_STEPS[1], 1)
        .otherwise(2)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), prio.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p1 = e.select(
        "user_id",
        "ts_us",
        "event_type",
        F.last(
            F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("ts_us")),
            ignorenulls=True,
        ).over(w).alias("v_ts"),
    )
    is_qc = (
        (F.col("event_type") == FUNNEL_STEPS[1])
        & (F.col("v_ts") >= F.col("ts_us") - FUNNEL_WINDOW_US)
    )
    p2 = p1.select(
        "user_id",
        "ts_us",
        "event_type",
        is_qc.alias("is_qc"),
        F.last(
            F.when(is_qc, F.col("ts_us")), ignorenulls=True
        ).over(w).alias("qc_ts"),
    )
    converts = (
        (F.col("event_type") == FUNNEL_STEPS[2])
        & (F.col("qc_ts") >= F.col("ts_us") - FUNNEL_WINDOW_US)
    )
    agg = p2.agg(
        F.coalesce(
            F.sum((F.col("event_type") == FUNNEL_STEPS[0]).cast("long")),
            F.lit(0),
        ).alias("n0"),
        F.coalesce(F.sum(F.col("is_qc").cast("long")), F.lit(0)).alias("n1"),
        F.coalesce(F.sum(converts.cast("long")), F.lit(0)).alias("n2"),
    )
    rows = [
        agg.select(
            F.lit(i + 1).cast("int").alias("step"),
            F.lit(s).alias("event_type"),
            F.col(f"n{i}").alias("n_events"),
            F.when(
                F.col("n0") > 0, F.expr(f"div(n{i} * 1000000, n0)")
            ).alias("match_e6"),
        )
        for i, s in enumerate(FUNNEL_STEPS)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user reaches
    step k when their earliest step-k event is AFTER their earliest
    step-(k-1) event. One conditional min-aggregation per user (single
    shuffle), then a global roll-up — no per-step scans, no joins.

    Output: one row per funnel step with how many users reached it in
    order and the conversion ratio from step 1 (e6 integer)."""
    e = load_events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts_us"))).alias(f"t{i}")
            for i, s in enumerate(FUNNEL_STEPS)
        ]
    )
    reached = [F.col("t0").isNotNull()]
    for i in range(1, len(FUNNEL_STEPS)):
        reached.append(
            reached[i - 1]
            & F.col(f"t{i}").isNotNull()
            & (F.col(f"t{i}") > F.col(f"t{i-1}"))
        )
    # coalesce: a global agg over zero users yields one NULL row — report
    # zeros with a NULL (guarded) conversion instead.
    agg = firsts.agg(
        *[
            F.coalesce(F.sum(r.cast("long")), F.lit(0)).alias(f"n{i}")
            for i, r in enumerate(reached)
        ]
    )
    rows = [
        agg.select(
            F.lit(i + 1).cast("int").alias("step"),
            F.lit(s).alias("event_type"),
            F.col(f"n{i}").alias("n_users"),
            F.when(
                F.col("n0") > 0, F.expr(f"div(n{i} * 1000000, n0)")
            ).alias("conversion_e6"),
        )
        for i, s in enumerate(FUNNEL_STEPS)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day; for each
    (cohort_day, day_offset) the number of distinct users active that day.
    Two shuffles: per-user first-day (groupBy user), then the cohort
    matrix (distinct + groupBy) — the standard retention-table plan."""
    e = load_events(spark, sf_dir).withColumn(
        "day_us", F.col("ts_us") - F.col("ts_us") % (24 * HOUR_US)
    )
    first_day = e.groupBy("user_id").agg(F.min("day_us").alias("cohort_us"))
    return (
        e.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_us",
            F.expr(f"div(day_us - cohort_us, {24 * HOUR_US})").alias("day_offset"),
        )
        .distinct()
        .groupBy("cohort_us", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series RESAMPLING with gap fill: the hourly count series per
    event type, with every hour of the observed range present — silent
    hours filled as 0 and flagged. Downstream consumers (anomaly
    detectors, forecasting featurizers) need a dense calendar; a naive
    groupBy emits only hours that happened.

    Plan: the calendar spine is ``sequence(min_hour, max_hour)`` exploded
    from the ONE-ROW bounds aggregate — pure plan, no driver collect —
    cross-joined with the distinct type table (|hours| × |types| is
    metadata-sized next to the fact scan, and both sides of that grid
    are broadcast); the heavy side stays one partial+final hash agg,
    then a broadcast left join fills the gaps. At 100 TB nothing here
    changes: the spine is still tiny, the fact agg still combines
    map-side."""
    e = load_events(spark, sf_dir)
    hour = (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us")
    counts = e.select(hour, "event_type").groupBy("hour_us", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = e.select(hour).agg(
        F.min("hour_us").alias("lo"), F.max("hour_us").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(HOUR_US))
        ).alias("hour_us")
    )
    types = e.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    return (
        grid.join(F.broadcast(counts), ["hour_us", "event_type"], "left")
        .select(
            "hour_us",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.col("n").isNull().alias("filled"),
        )
    )


def events_user_spend_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment event spend via the SALTED fact-dim join
    (operators/skew.py): the fact side scatters each user_id across 16
    deterministic xxhash64 sub-keys, the dim side replicates 16-fold, so
    a structurally hot user (one key = 30% of a 100 TB fact table —
    tests/test_skew.py pins the scatter) never lands on one reducer.

    Salting is TRANSPARENT to semantics — the oracle is the plain join —
    which is exactly the property that makes it safe to deploy: this
    registry entry makes that transparency a hash-checked contract, not
    a code comment."""
    from ..sources.tables import load_table
    from .skew import salted_join

    e = load_events(spark, sf_dir).withColumn("value_cents", _cents("value"))
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        e, dim, on=["user_id"], salt_from=["event_id"], n_salt=16
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents_sum"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("c_mktsegment")
    )


DAY_US = 24 * HOUR_US


def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap analytics: PEAK CONCURRENT SESSIONS per day — the
    classic +1/-1 boundary sweep, made scale-exact by day partitioning
    with carry-in.

    A naive sweep needs one GLOBAL ordering (one reducer owns the whole
    timeline). Instead: boundaries partition by day, each day's running
    sum starts from ``carry_in`` = sessions already active at the day
    boundary (a tiny days×sessions range join), and
    ``peak = carry_in + max(0, running)`` — bit-identical to the global
    sweep, but every window shuffle is keyed on day and the timeline
    parallelizes. Closed-interval ties: at equal ts the +1 sorts before
    the -1 (order by ts, delta DESC), so a session starting the instant
    another ends counts both. Days with no session boundary are omitted
    (their concurrency is the constant carry-in; union the calendar
    spine of :func:`events_resample` if a dense series is needed)."""
    sess = events_sessionize(spark, sf_dir).select(
        "user_id", "session_start_us", "session_end_us"
    )
    starts = sess.select(
        F.col("session_start_us").alias("ts"), F.lit(1).alias("delta")
    )
    ends = sess.select(
        F.col("session_end_us").alias("ts"), F.lit(-1).alias("delta")
    )
    b = starts.unionByName(ends).withColumn(
        "day_us", F.col("ts") - F.col("ts") % DAY_US
    )
    days = b.select("day_us").distinct()
    carry = (
        days.join(
            sess,
            (F.col("session_start_us") < F.col("day_us"))
            & (F.col("session_end_us") >= F.col("day_us")),
        )
        .groupBy("day_us")
        .agg(F.count(F.lit(1)).alias("carry_in"))
    )
    w = (
        Window.partitionBy("day_us")
        .orderBy(F.asc("ts"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = (
        b.withColumn("running", F.sum("delta").over(w))
        .groupBy("day_us")
        .agg(F.max("running").alias("peak_delta"))
    )
    return (
        peak.join(carry, "day_us", "left")
        .select(
            "day_us",
            (
                F.coalesce("carry_in", F.lit(0))
                + F.greatest(F.lit(0), F.col("peak_delta"))
            )
            .cast("long")
            .alias("peak_concurrent"),
        )
        .orderBy("day_us")
    )


def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov estimate): for
    each ordered pair (from_type, to_type) of CONSECUTIVE events within a
    user's stream, the transition count and its conditional probability in
    integer parts-per-million (``n · 1e6 // Σ_to n`` — never a float
    ratio).  The behavioral-model shape: next-action prediction priors,
    funnel leakage, bot detection.

    Plan: ONE shuffle keyed on user_id serves the lead() window (ordering
    is (ts_us, event_id) — total, so ties are deterministic); the pair
    aggregation then shuffles |types|² ≤ 25 groups with map-side combine;
    the per-from total is a broadcast-sized window over the matrix itself.
    No step grows with data except the user-keyed exchange.
    """
    e = load_events(spark, sf_dir)
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        e.withColumn("to_type", F.lead("event_type").over(order))
        .where(F.col("to_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            "to_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_from = Window.partitionBy("from_type")
    return (
        pairs.withColumn("from_total", F.sum("n").over(per_from))
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("div(n * 1000000, from_total)").alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


AB_CONVERT_TYPE = "purchase"
AB_CONVERT_MIN_CENTS = 15_000  # a qualifying purchase is ≥ $150
# ceil(3.841458820… · 1e6), χ²₁ at α=0.05 (floor is 3_841_458). Using the
# CEILING means a chi² statistic landing in [3.8414588, 3.841459) — a
# 1e-6-wide band at the critical value — reports non-significant: the
# conservative direction for a significance test. Both engines share the
# constant, so oracle parity holds either way; the 1e-6 boundary
# convention is: significance requires chi2_e6 (itself a floor) to reach
# the ceiling of the critical value. (ADVICE r4: comment previously
# mis-stated this as a floor.)
AB_CHI2_95_E6 = 3_841_459


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-variant experiment readout: users split A/B by a deterministic
    assignment hash (user_id parity — a stand-in for the usual
    bucket-of-md5), conversion = "did the user ever fire a purchase
    event", and the 2×2 chi-square statistic decides significance at 95%.

    Exactness contract: counts and the ppm conversion rates are exact
    integers.  χ² itself is computed in doubles — but every input
    (a, b, c, d, N) is an exact BIGINT, and both engines evaluate the
    same expression tree left-to-right on identical operands, so the
    doubles (and the floor to chi2_e6, and the ≥-threshold decision)
    are bit-identical, the same contract the cosine operators use.

    Plan: one user-keyed partial aggregation (converted = max(is_convert)
    per user — map-side combinable), then a 2-group aggregate and a
    single-row projection.  Nothing about this changes at 1e9 users; the
    only data-sized exchange is the per-user combine.
    """
    e = load_events(spark, sf_dir)
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == AB_CONVERT_TYPE)
                & (_cents("value") >= AB_CONVERT_MIN_CENTS),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    cell = users.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = cell.groupBy().agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv"))).alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv"))).alias("conv_b"),
    )
    # ad−bc is an EXACT integer (bounded by N²/4 — bigint-safe to ~4e9
    # users); the χ² division is the only float step, on identical
    # operands in both engines.  Squaring is d·d, never pow() (pow is not
    # guaranteed correctly rounded everywhere; multiplication is).
    det = (
        F.col("conv_a") * (F.col("n_b") - F.col("conv_b"))
        - F.col("conv_b") * (F.col("n_a") - F.col("conv_a"))
    ).alias("det")
    staged = wide.select("n_a", "conv_a", "n_b", "conv_b", det)
    degenerate = (
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b"))
    )
    chi2_raw = F.floor(
        (F.col("n_a") + F.col("n_b")).cast("double")
        * (F.col("det").cast("double") * F.col("det").cast("double"))
        / (
            F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
            * (F.col("conv_a") + F.col("conv_b")).cast("double")
            * (
                F.col("n_a")
                + F.col("n_b")
                - F.col("conv_a")
                - F.col("conv_b")
            ).cast("double")
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    # all-convert / none-convert table: χ² is 0/0 — define it as 0 (no
    # evidence of difference), identically in the oracle
    chi2_e6 = F.when(degenerate, F.lit(0)).otherwise(chi2_raw).cast("long")
    return staged.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr("div(conv_a * 1000000, n_a)").alias("p_a_ppm"),
        F.expr("div(conv_b * 1000000, n_b)").alias("p_b_ppm"),
        chi2_e6.alias("chi2_e6"),
        (chi2_e6 >= AB_CHI2_95_E6).alias("significant"),
    )


_AB_ORACLE = f"""
WITH users AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = '{AB_CONVERT_TYPE}'
                     AND CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                         >= {AB_CONVERT_MIN_CENTS}
                    THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY user_id
),
cell AS (
    SELECT user_id % 2 AS variant, COUNT(*) AS n,
           CAST(SUM(converted) AS BIGINT) AS conv
    FROM users GROUP BY 1
),
wide AS (
    SELECT
        CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN variant = 0 THEN conv END) AS BIGINT) AS conv_a,
        CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN variant = 1 THEN conv END) AS BIGINT) AS conv_b
    FROM cell
),
staged AS (
    SELECT *, conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a) AS det
    FROM wide
),
scored AS (
    SELECT *,
           CASE WHEN conv_a + conv_b = 0
                  OR conv_a + conv_b = n_a + n_b THEN 0
           ELSE CAST(FLOOR(
               CAST(n_a + n_b AS DOUBLE)
               * (CAST(det AS DOUBLE) * CAST(det AS DOUBLE))
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                  * CAST(conv_a + conv_b AS DOUBLE)
                  * CAST(n_a + n_b - conv_a - conv_b AS DOUBLE))
               * 1000000.0
           ) AS BIGINT) END AS chi2_e6
    FROM staged
)
SELECT n_a, conv_a, n_b, conv_b,
       conv_a * 1000000 // n_a AS p_a_ppm,
       conv_b * 1000000 // n_b AS p_b_ppm,
       chi2_e6,
       chi2_e6 >= {AB_CHI2_95_E6} AS significant
FROM scored
"""


MONTH_DAYS_US = 30 * 24 * HOUR_US  # fixed 30-day "month" grid (calendar-free)


def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / MAU / stickiness — the product-analytics census: distinct
    active users per epoch-aligned day, distinct users of the containing
    30-day window, and their ratio in exact ppm (``div(dau·1e6, mau)``).

    Scale notes: COUNT(DISTINCT user) is the classically expensive op —
    here each grain is ONE expand-free exact distinct aggregate keyed on
    (bucket, user) partials (Spark plans two-stage distinct aggregation:
    partial sets per partition combine before the final count).  The two
    grains join on the month key — |days| rows against |months| rows,
    broadcast forever.  At 100 TB the same plan holds; if exactness can
    be relaxed, swap count_distinct for approx_count_distinct and keep
    the shape (the tolerance-pinning pattern of tpch_distinct_parts).
    """
    e = load_events(spark, sf_dir).select(
        (F.col("ts_us") - F.col("ts_us") % (24 * HOUR_US)).alias("day_us"),
        (F.col("ts_us") - F.col("ts_us") % MONTH_DAYS_US).alias("month_us"),
        "user_id",
    )
    dau = e.groupBy("day_us", "month_us").agg(
        F.count_distinct("user_id").alias("dau")
    )
    mau = e.groupBy("month_us").agg(F.count_distinct("user_id").alias("mau"))
    return (
        dau.join(F.broadcast(mau), "month_us")
        .select(
            "day_us",
            "month_us",
            "dau",
            "mau",
            F.expr("div(dau * 1000000, mau)").alias("stickiness_ppm"),
        )
        .orderBy("day_us")
    )


_DAU_MAU_ORACLE = f"""
WITH e AS (
    SELECT epoch_us(ts) - epoch_us(ts) % {24 * HOUR_US} AS day_us,
           epoch_us(ts) - epoch_us(ts) % {MONTH_DAYS_US} AS month_us,
           user_id
    FROM events
),
dau AS (
    SELECT day_us, month_us, COUNT(DISTINCT user_id) AS dau
    FROM e GROUP BY 1, 2
),
mau AS (
    SELECT month_us, COUNT(DISTINCT user_id) AS mau FROM e GROUP BY 1
)
SELECT day_us, dau.month_us, CAST(dau AS BIGINT) AS dau,
       CAST(mau AS BIGINT) AS mau,
       dau * 1000000 // mau AS stickiness_ppm
FROM dau JOIN mau ON dau.month_us = mau.month_us
ORDER BY day_us
"""


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of hourly event volume per
    type — the smoothing primitive behind alerting baselines, computed
    as the EXACT integer recurrence ``s_t = div(s_{t-1} + x_t, 2)``
    (α = ½; s_0 = x_0): a floor at every step, so the whole series is
    integers and both engines agree bit-for-bit (a float EWMA would
    accumulate rounding skew between engines).

    A recurrence has no windowed-SQL form; the trick is that the HOURLY
    frame is calendar-bounded (|hours × types|, independent of event
    volume at any scale), so each type's series is collected into one
    array and folded with a higher-order ``aggregate`` lambda — JVM-side,
    no UDF; the corpus-scale work remains the one hourly rollup shuffle.
    The DuckDB oracle runs the same recurrence as a recursive CTE over
    the hour index — an independent formulation of the same fixpoint.

    Output: (event_type, hour_us, n_events, ewma) for every hour.
    """
    hourly = (
        load_events(spark, sf_dir)
        .groupBy(
            "event_type",
            (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    series = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hour_us", "n"))).alias("xs")
    )
    # fold: acc is the emitted array of (hour_us, n, s); each step floors
    # (prev_s + x) / 2, seeding with x_0
    folded = series.select(
        "event_type",
        F.aggregate(
            "xs",
            F.expr(
                "CAST(array() AS array<struct<hour_us:bigint,n:bigint,s:bigint>>)"
            ),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.struct(
                        x["hour_us"].alias("hour_us"),
                        x["n"].alias("n"),
                        F.when(
                            F.size(acc) == 0, x["n"].cast("long")
                        )
                        .otherwise(
                            F.floor(
                                (
                                    F.element_at(acc, -1)["s"] + x["n"]
                                ).cast("double")
                                / F.lit(2.0)
                            ).cast("long")
                        )
                        .alias("s"),
                    )
                ),
            ),
        ).alias("out"),
    )
    return (
        folded.select("event_type", F.explode("out").alias("o"))
        .select(
            "event_type",
            F.col("o.hour_us").alias("hour_us"),
            F.col("o.n").alias("n_events"),
            F.col("o.s").alias("ewma"),
        )
        .orderBy("event_type", "hour_us")
    )


_EWMA_ORACLE = f"""
WITH RECURSIVE hourly AS (
    SELECT event_type,
           epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
idx AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY hour_us) AS i
    FROM hourly
),
rec(event_type, i, hour_us, n, s) AS (
    SELECT event_type, i, hour_us, n, CAST(n AS BIGINT)
    FROM idx WHERE i = 1
    UNION ALL
    SELECT x.event_type, x.i, x.hour_us, x.n,
           CAST(FLOOR(CAST(r.s + x.n AS DOUBLE) / 2.0) AS BIGINT)
    FROM rec r JOIN idx x
      ON x.event_type = r.event_type AND x.i = r.i + 1
)
SELECT event_type, hour_us, CAST(n AS BIGINT) AS n_events, s AS ewma
FROM rec
ORDER BY event_type, hour_us
"""


QUERIES = {
    "events_ewma": events_ewma,
    "events_dau_mau": events_dau_mau,
    "events_transitions": events_transitions,
    "events_ab_test": events_ab_test,
    "events_hourly": events_hourly,
    "events_hourly_incremental": events_hourly_incremental,
    "events_sessionize": events_sessionize,
    "events_json": events_json,
    "events_anomaly": events_anomaly,
    "events_funnel": events_funnel,
    "events_funnel_windowed": events_funnel_windowed,
    "events_retention": events_retention,
    "events_resample": events_resample,
    "events_user_spend_salted": events_user_spend_salted,
    "events_concurrency": events_concurrency,
}

ORACLE_SQL = {
    "events_ewma": _EWMA_ORACLE,
    "events_funnel_windowed": f"""
        WITH e AS MATERIALIZED (
            SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
            WHERE event_type IN ('{FUNNEL_STEPS[0]}', '{FUNNEL_STEPS[1]}',
                                 '{FUNNEL_STEPS[2]}')
        ),
        qc AS MATERIALIZED (
            SELECT c.user_id, c.ts_us FROM e c
            WHERE c.event_type = '{FUNNEL_STEPS[1]}' AND EXISTS (
                SELECT 1 FROM e v
                WHERE v.user_id = c.user_id
                  AND v.event_type = '{FUNNEL_STEPS[0]}'
                  AND v.ts_us <= c.ts_us
                  AND v.ts_us >= c.ts_us - {FUNNEL_WINDOW_US})
        ),
        cp AS (
            SELECT p.user_id FROM e p
            WHERE p.event_type = '{FUNNEL_STEPS[2]}' AND EXISTS (
                SELECT 1 FROM qc
                WHERE qc.user_id = p.user_id
                  AND qc.ts_us <= p.ts_us
                  AND qc.ts_us >= p.ts_us - {FUNNEL_WINDOW_US})
        ),
        counts AS (
            SELECT
              (SELECT COUNT(*) FROM e
                WHERE event_type = '{FUNNEL_STEPS[0]}') AS n0,
              (SELECT COUNT(*) FROM qc) AS n1,
              (SELECT COUNT(*) FROM cp) AS n2
        )
        SELECT CAST(1 AS INT) AS step, '{FUNNEL_STEPS[0]}' AS event_type,
               CAST(n0 AS BIGINT) AS n_events,
               CASE WHEN n0 > 0 THEN CAST(n0 * 1000000 // n0 AS BIGINT) END
                   AS match_e6
        FROM counts
        UNION ALL
        SELECT CAST(2 AS INT), '{FUNNEL_STEPS[1]}', CAST(n1 AS BIGINT),
               CASE WHEN n0 > 0 THEN CAST(n1 * 1000000 // n0 AS BIGINT) END
        FROM counts
        UNION ALL
        SELECT CAST(3 AS INT), '{FUNNEL_STEPS[2]}', CAST(n2 AS BIGINT),
               CASE WHEN n0 > 0 THEN CAST(n2 * 1000000 // n0 AS BIGINT) END
        FROM counts
    """,
    "events_dau_mau": _DAU_MAU_ORACLE,
    "events_ab_test": _AB_ORACLE,
    "events_transitions": """
        WITH p AS (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS to_type
            FROM events
        ),
        m AS (
            SELECT from_type, to_type, COUNT(*) AS n
            FROM p WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type)
                    AS BIGINT) AS p_ppm
        FROM m
        ORDER BY from_type, to_type
    """,
    "events_hourly": f"""
        SELECT epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS value_cents_sum,
               MIN(event_id) AS first_event_id
        FROM events GROUP BY 1, 2
    """,
    # the merged incremental rollup must equal the full recompute — the
    # shared oracle IS the algebraic-merge proof.
    "events_hourly_incremental": f"""
        SELECT epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS value_cents_sum,
               MIN(event_id) AS first_event_id
        FROM events GROUP BY 1, 2
    """,
    "events_sessionize": f"""
        WITH flagged AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sess AS (
            -- CAST: DuckDB's windowed SUM over INTEGER yields HUGEINT, which
            -- pandas materializes as float64 and the value hash diverges from
            -- Spark's int64 (same trap as window_suite's w_range).
            SELECT *, CAST(SUM(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq,
               MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS value_cents_sum
        FROM sess GROUP BY user_id, session_seq
    """,
    "events_anomaly": f"""
        WITH hourly AS (
            SELECT epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us,
                   event_type, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            -- CAST the windowed SUMs: DuckDB HUGEINT -> pandas float64
            -- otherwise (the window_suite / sessionize trap)
            SELECT *, COUNT(*) OVER w AS m,
                   CAST(SUM(n_events) OVER w AS BIGINT) AS s,
                   CAST(SUM(n_events * n_events) OVER w AS BIGINT) AS s2
            FROM hourly WINDOW w AS (PARTITION BY event_type)
        )
        SELECT event_type, hour_us, n_events, m, s,
               (CAST(m AS DECIMAL(38,0)) * CAST(n_events AS DECIMAL(38,0))
                - CAST(s AS DECIMAL(38,0)))
               * (CAST(m AS DECIMAL(38,0)) * CAST(n_events AS DECIMAL(38,0))
                - CAST(s AS DECIMAL(38,0)))
               > {ANOMALY_K2} * (CAST(m AS DECIMAL(38,0)) * CAST(s2 AS DECIMAL(38,0))
                                 - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))
                   AS is_anomaly
        FROM stats
    """,
    "events_funnel": f"""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN epoch_us(ts) END) AS t0,
                   MIN(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' THEN epoch_us(ts) END) AS t1,
                   MIN(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' THEN epoch_us(ts) END) AS t2
            FROM events GROUP BY user_id
        ),
        agg AS (
            SELECT
                CAST(COALESCE(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n0,
                CAST(COALESCE(SUM(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n1,
                CAST(COALESCE(SUM(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                              AND t2 IS NOT NULL AND t2 > t1
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n2
            FROM firsts
        )
        SELECT CAST(1 AS INT) AS step, '{FUNNEL_STEPS[0]}' AS event_type, n0 AS n_users,
               CASE WHEN n0 > 0 THEN (n0 * 1000000) // n0 END AS conversion_e6 FROM agg
        UNION ALL
        SELECT CAST(2 AS INT), '{FUNNEL_STEPS[1]}', n1,
               CASE WHEN n0 > 0 THEN (n1 * 1000000) // n0 END FROM agg
        UNION ALL
        SELECT CAST(3 AS INT), '{FUNNEL_STEPS[2]}', n2,
               CASE WHEN n0 > 0 THEN (n2 * 1000000) // n0 END FROM agg
    """,
    "events_retention": f"""
        WITH e AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(ts) % {24 * HOUR_US} AS day_us
            FROM events
        ),
        fd AS (SELECT user_id, MIN(day_us) AS cohort_us FROM e GROUP BY user_id)
        SELECT cohort_us, day_offset, COUNT(*) AS n_users FROM (
            SELECT DISTINCT e.user_id, fd.cohort_us,
                   (e.day_us - fd.cohort_us) // {24 * HOUR_US} AS day_offset
            FROM e JOIN fd USING (user_id)
        ) GROUP BY cohort_us, day_offset
    """,
    "events_json": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        FROM events GROUP BY event_type
    """,
    "events_resample": f"""
        WITH c AS (
            SELECT epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us,
                   event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        b AS (SELECT MIN(hour_us) AS lo, MAX(hour_us) AS hi FROM c),
        spine AS (
            SELECT unnest(generate_series(lo, hi, {HOUR_US})) AS hour_us
            FROM b
        ),
        grid AS (
            SELECT s.hour_us, t.event_type
            FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        )
        SELECT g.hour_us, g.event_type,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events,
               c.n IS NULL AS filled
        FROM grid g LEFT JOIN c USING (hour_us, event_type)
    """,
    "events_concurrency": f"""
        WITH flagged AS (
            SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ),
        sq AS (
            SELECT *, CAST(SUM(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS session_seq
            FROM flagged
        ),
        sess AS (
            SELECT user_id, session_seq,
                   MIN(ts_us) AS session_start_us,
                   MAX(ts_us) AS session_end_us
            FROM sq GROUP BY user_id, session_seq
        ),
        b AS (
            SELECT session_start_us AS ts, 1 AS delta FROM sess
            UNION ALL
            SELECT session_end_us AS ts, -1 AS delta FROM sess
        ),
        bd AS (SELECT ts, delta, ts - ts % {DAY_US} AS day_us FROM b),
        days AS (SELECT DISTINCT day_us FROM bd),
        carry AS (
            SELECT d.day_us, COUNT(*) AS carry_in
            FROM days d JOIN sess s
              ON s.session_start_us < d.day_us AND s.session_end_us >= d.day_us
            GROUP BY d.day_us
        ),
        run AS (
            SELECT day_us, CAST(SUM(delta) OVER (
                PARTITION BY day_us ORDER BY ts ASC, delta DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS running
            FROM bd
        ),
        peak AS (
            SELECT day_us, MAX(running) AS peak_delta FROM run GROUP BY day_us
        )
        SELECT p.day_us,
               CAST(COALESCE(c.carry_in, 0)
                    + GREATEST(0, p.peak_delta) AS BIGINT) AS peak_concurrent
        FROM peak p LEFT JOIN carry c USING (day_us)
        ORDER BY p.day_us
    """,
    # the oracle is the PLAIN join — salting must be invisible to results.
    "events_user_spend_salted": """
        SELECT c_mktsegment, COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS value_cents_sum,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
}
