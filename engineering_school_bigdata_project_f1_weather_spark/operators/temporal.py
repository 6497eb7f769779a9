"""Temporal join operators over ``events`` — the time-series shapes Spark
has no single built-in for (as-of join, range join, hypertable-style
multi-grain rollup), each composed from declarative primitives:

- ``events_asof_purchase`` : AS-OF join — every event picks the user's most
  recent purchase at-or-before its timestamp. Spark lacks ASOF JOIN; the
  composition is the classic union + last-non-null window (one shuffle on
  the user key, no per-row range probing). The DuckDB oracle uses its
  native ``ASOF LEFT JOIN`` — proving the composition implements exactly
  those semantics.
- ``events_value_bands``   : range (interval) join of events against an
  irregular value-band dimension. The naive Spark plan for a theta join is
  a broadcast nested loop; the scale path implemented here bins both sides
  on a fixed grid and equi-joins on the bin + residual filter — shuffle
  keyed, never O(|events| x |bands|) probing.
- ``events_multigrain``    : hypertable-style rollup to (day, hour) grains
  in one pass via ROLLUP + grouping flags.

Time domain: integer epoch-micros (``ts_us``) as in operators/events.py —
exact in both engines, timezone-proof.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.localrel import local_rows
from .events import HOUR_US, load_events

DAY_US = 24 * HOUR_US

# Irregular value bands (quarter-fraction boundaries => exact doubles in
# every engine). Half-open [lo, hi).
VALUE_BANDS = [
    (0, 0.0, 2.0),
    (1, 2.0, 7.5),
    (2, 7.5, 31.25),
    (3, 31.25, 125.0),
    (4, 125.0, 1000.0),
]
BAND_GRID = 4  # bins per unit: bin = floor(value * 4); boundaries align exactly


def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each event → the user's latest purchase with
    ``purchase.ts_us <= event.ts_us`` (inclusive), NULL when none.

    Composition: markers (deduped to one per (user, ts)) are unioned under
    the event rows, sorted (ts, markers-first), and a last-non-null window
    carries the active marker forward — one shuffle on ``user_id``, state
    bounded per partition. Equivalent DuckDB: native ASOF LEFT JOIN.
    """
    e = load_events(spark, sf_dir)
    markers = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("purchase_id"))
    )

    left = e.select(
        "user_id",
        "ts_us",
        "event_id",
        "event_type",
        F.lit(0).alias("is_marker"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("long").alias("purchase_ts_us"),
    )
    right = markers.select(
        "user_id",
        "ts_us",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(1).alias("is_marker"),
        "purchase_id",
        F.col("ts_us").alias("purchase_ts_us"),
    )

    # Markers sort before events at equal ts => inclusive (>=) semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("is_marker").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).select(
        "*",
        F.last("purchase_id", ignorenulls=True).over(w).alias("last_purchase_id"),
        F.last("purchase_ts_us", ignorenulls=True).over(w).alias("last_purchase_ts_us"),
    )
    return merged.where(F.col("is_marker") == 0).select(
        "event_id",
        "user_id",
        "ts_us",
        "event_type",
        "last_purchase_id",
        "last_purchase_ts_us",
    )


ASOF_ORACLE = """
WITH mk AS (
    SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS purchase_id
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, epoch_us(ts)
),
ev AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
)
SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
       m.purchase_id AS last_purchase_id,
       m.ts_us AS last_purchase_ts_us
FROM ev e ASOF LEFT JOIN mk m
  ON e.user_id = m.user_id AND e.ts_us >= m.ts_us
"""


def _band_bins(spark: SparkSession) -> DataFrame:
    """Expand each band into its covering grid bins (tiny driver-side dim —
    |bands| x |bins per band| rows, broadcast to the join)."""
    rows = []
    for band_id, lo, hi in VALUE_BANDS:
        for b in range(int(lo * BAND_GRID), int(hi * BAND_GRID)):
            rows.append((band_id, b, lo, hi))
    return local_rows(spark, rows, "band_id INT, bin BIGINT, lo DOUBLE, hi DOUBLE")


def events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via grid binning: events equi-join the exploded band-bin
    dim on ``floor(value * grid)`` then apply the residual range filter —
    the shuffle-keyed scale path for interval joins (no nested-loop probe).
    """
    e = load_events(spark, sf_dir).withColumn(
        "bin", F.floor(F.col("value") * BAND_GRID).cast("long")
    )
    bins = _band_bins(spark)
    joined = e.join(F.broadcast(bins), "bin").where(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return (
        joined.groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
            ).alias("value_cents_sum"),
        )
    )


_BANDS_VALUES = ", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in VALUE_BANDS)

BANDS_ORACLE = f"""
WITH bands0(band_id, lo, hi) AS (VALUES {_BANDS_VALUES}),
bands AS (
    SELECT band_id, CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi
    FROM bands0
)
SELECT CAST(b.band_id AS INT) AS band_id, b.lo, b.hi,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents_sum
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id, b.lo, b.hi
"""


def events_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup: (day, hour) → (day) → (total)
    in ONE aggregation pass (Spark expands the grouping sets; no re-scan
    per grain). Grain flags via ``grouping()``."""
    e = load_events(spark, sf_dir)
    binned = e.select(
        (F.col("ts_us") - F.col("ts_us") % DAY_US).alias("day_us"),
        (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("hour_us"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("value_cents"),
    )
    return (
        binned.rollup("day_us", "hour_us")
        .agg(
            F.grouping("day_us").cast("int").alias("g_day"),
            F.grouping("hour_us").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("value_cents_sum"),
        )
    )


MULTIGRAIN_ORACLE = f"""
WITH binned AS (
    SELECT epoch_us(ts) - epoch_us(ts) % {DAY_US} AS day_us,
           epoch_us(ts) - epoch_us(ts) % {HOUR_US} AS hour_us,
           CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS value_cents
    FROM events
)
SELECT day_us, hour_us,
       CAST(GROUPING(day_us) AS INT) AS g_day,
       CAST(GROUPING(hour_us) AS INT) AS g_hour,
       COUNT(*) AS n_events,
       CAST(SUM(value_cents) AS BIGINT) AS value_cents_sum
FROM binned
GROUP BY ROLLUP (day_us, hour_us)
"""

def events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 build from an event log: collapse
    each user's consecutive run of equal ``event_type`` into one validity
    interval ``[valid_from_us, valid_to_us)`` (valid_to = the next run's
    start; NULL marks the current row) — the standard
    dimension-construction step a warehouse runs over CDC/event streams,
    done as pure windows: one shuffle on the user key, a
    change-flag → running-sum run id, one group-by, one lead().

    Output: (user_id, event_type, valid_from_us, valid_to_us, n_events)
    per run, deterministically ordered within ties by event_id.

    100 TB shape: both windows and the aggregation share the single
    ``user_id`` hash partitioning (no second shuffle); state per group is
    one row — Spark's WindowExec streams sorted runs, so per-user history
    length never accumulates in memory."""
    e = load_events(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "event_type"
    )
    by_time = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # Null-safe change flag (round-4 review): a NULL event_type must start
    # its own run — with plain `!=` the comparison is NULL, the row would
    # silently merge into the previous run, and the (user_id, run_id,
    # event_type) grouping would then split one run_id into two rows,
    # making the lead() chain nondeterministic. `eqNullSafe` treats the
    # first row (lag NULL vs value) and NULL-typed rows uniformly; the
    # oracle's IS DISTINCT FROM is the exact SQL twin.
    flagged = e.withColumn(
        "chg",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(by_time)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "run_id",
        F.sum("chg").over(
            by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    by_run = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(by_run).alias("valid_to_us"),
        "n_events",
    )


SCD2_ORACLE = """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
    FROM events
),
flagged AS (
    SELECT *,
           CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
                THEN 1 ELSE 0 END AS chg
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
runs0 AS (
    SELECT *,
           CAST(SUM(chg) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS run_id
    FROM flagged
),
runs AS (
    SELECT user_id, run_id, event_type,
           MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
    FROM runs0 GROUP BY user_id, run_id, event_type
)
SELECT user_id, event_type, valid_from_us,
       lead(valid_from_us) OVER (
           PARTITION BY user_id ORDER BY run_id
       ) AS valid_to_us,
       CAST(n_events AS BIGINT) AS n_events
FROM runs
"""


def events_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) lookup against an SCD2 dimension: every
    purchase event is joined to the user-state interval active AT its
    timestamp — the "what plan/state was the customer in when they
    bought" join every warehouse runs against its type-2 dimensions.

    The dimension is the SCD2 run table built over the user's NON-purchase
    events (state = last browsing activity run); the facts are the
    purchases.  Join semantics: equi-key on user_id plus the half-open
    interval predicate ``valid_from ≤ ts < valid_to`` (NULL valid_to =
    current row).  LEFT join — purchases before a user's first state
    interval surface with NULL state rather than vanishing.

    Scale shape: the range predicate rides ON the user_id equi-join, so
    per-key work is |facts_u| × |intervals_u| — bounded by per-user
    history, never a global theta join; both sides shuffle once on the
    same key.  Intervals partition each user's timeline (runs are
    consecutive by construction), so at most one interval matches — a
    property the test pins.
    """
    e = load_events(spark, sf_dir).select(
        "user_id", "ts_us", "event_id", "event_type"
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("f_user"), F.col("ts_us").alias("f_ts")
    )
    by_time = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dim_events = e.where(F.col("event_type") != "purchase")
    flagged = dim_events.withColumn(
        "chg",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(by_time)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "run_id",
        F.sum("chg").over(
            by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = flagged.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts_us").alias("valid_from_us")
    )
    by_run = Window.partitionBy("user_id").orderBy("run_id")
    dim = runs.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from_us",
        F.lead("valid_from_us").over(by_run).alias("valid_to_us"),
    )
    return (
        facts.join(
            dim,
            (F.col("f_user") == F.col("user_id"))
            & (F.col("f_ts") >= F.col("valid_from_us"))
            & (
                F.col("valid_to_us").isNull()
                | (F.col("f_ts") < F.col("valid_to_us"))
            ),
            "left",
        )
        .select(
            "event_id",
            F.col("f_user").alias("user_id"),
            F.col("f_ts").alias("ts_us"),
            "state",
            "valid_from_us",
        )
        .orderBy("event_id")
    )


SCD2_LOOKUP_ORACLE = """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
    FROM events
),
facts AS (
    SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'
),
flagged AS (
    SELECT *,
           CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
                THEN 1 ELSE 0 END AS chg
    FROM e WHERE event_type <> 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
runs0 AS (
    SELECT *,
           SUM(chg) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS run_id
    FROM flagged
),
runs AS (
    SELECT user_id, run_id, event_type AS state,
           MIN(ts_us) AS valid_from_us
    FROM runs0 GROUP BY user_id, run_id, event_type
),
dim AS (
    SELECT user_id, state, valid_from_us,
           lead(valid_from_us) OVER (
               PARTITION BY user_id ORDER BY run_id
           ) AS valid_to_us
    FROM runs
)
SELECT f.event_id, f.user_id, f.ts_us, d.state, d.valid_from_us
FROM facts f
LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND f.ts_us >= d.valid_from_us
 AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
ORDER BY f.event_id
"""


# ------------------------------- last-touch attribution (round 7)
ATTRIB_WINDOW_US = 24 * HOUR_US  # purchases attribute to a view ≤ 24h back
ATTRIB_CHANNELS = 8  # channel = props.k % 8


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION — the tolerance-windowed as-of join the
    plain as-of can't express: each purchase attributes its
    integer-cents value to the CHANNEL (``props.k % 8``) of the user's
    most recent VIEW at-or-before the purchase, but only if that view
    falls inside the 24 h attribution window; otherwise the purchase is
    unattributed (NULL channel) — the report every marketing/traffic
    pipeline runs.

    Composition: the asof union-marker trick (views as markers carrying
    (view_ts, channel), markers sorted before facts at equal ts for
    inclusive semantics, one last-non-null window per user) — then the
    TOLERANCE is a plain filter on the carried timestamp: the carried
    view is the LATEST one ≤ the purchase, so "latest view inside the
    window" ≡ "carried view inside the window" (if the max is outside,
    every view is). Ties at the same (user, ts): max event_id, same
    rule as the asof markers. One shuffle on user_id; the aggregate is
    a CHANNELS-row frame.

    Output: (channel, n_purchases, attributed_cents) — channel NULL =
    the unattributed bucket.  The oracle is the DEFINITIONAL correlated
    form (rank views per purchase inside the window), so the hash gate
    proves the carry-forward + filter implements exactly those
    semantics."""
    from .events import _cents

    e = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    views = (
        e.where(F.col("event_type") == "view")
        .select("user_id", "ts_us", "event_id", (k % ATTRIB_CHANNELS).alias("channel"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts_us").orderBy(F.desc("event_id"))
            ),
        )
        .where(F.col("rn") == 1)  # one marker per (user, ts): max event_id
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id", _cents("value").alias("cents")
    )
    # The marker payload rides as ONE struct (ADVICE r7): a single
    # last(ignorenulls) carry guarantees the timestamp and the channel
    # always come from the SAME latest view — two independent carries
    # could diverge if a view ever had a NULL channel (the timestamp
    # would advance while the channel came from an older view),
    # breaking the oracle's rn=1 latest-view semantics.
    left = purchases.select(
        "user_id", "ts_us", "event_id", "cents",
        F.lit(0).alias("is_marker"),
        F.lit(None)
        .cast("struct<view_ts_us:long,channel:long>")
        .alias("mk"),
    )
    right = views.select(
        "user_id", "ts_us",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("cents"),
        F.lit(1).alias("is_marker"),
        F.struct(
            F.col("ts_us").alias("view_ts_us"), F.col("channel")
        ).alias("mk"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("is_marker").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        left.unionByName(right)
        .select("*", F.last("mk", ignorenulls=True).over(w).alias("last_mk"))
        .where(F.col("is_marker") == 0)
    )
    attributed = carried.select(
        "cents",
        F.when(
            F.col("last_mk.view_ts_us") >= F.col("ts_us") - ATTRIB_WINDOW_US,
            F.col("last_mk.channel"),
        ).alias("channel"),  # NULL carried marker stays NULL (no view at all)
    )
    return (
        attributed.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
        .orderBy(F.asc_nulls_last("channel"))
    )


ATTRIBUTION_ORACLE = f"""
WITH p AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
v AS (
    SELECT user_id, epoch_us(ts) AS ts_us, event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)
               % {ATTRIB_CHANNELS} AS channel
    FROM events WHERE event_type = 'view'
),
ranked AS (
    SELECT p.event_id AS pid, p.cents, v.channel,
           ROW_NUMBER() OVER (PARTITION BY p.event_id
               ORDER BY v.ts_us DESC, v.event_id DESC) AS rn
    FROM p JOIN v
      ON v.user_id = p.user_id
     AND v.ts_us <= p.ts_us
     AND v.ts_us >= p.ts_us - {ATTRIB_WINDOW_US}
),
att AS (SELECT pid, cents, channel FROM ranked WHERE rn = 1),
labeled AS (
    SELECT p.cents, att.channel
    FROM p LEFT JOIN att ON att.pid = p.event_id
)
SELECT channel, COUNT(*) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS attributed_cents
FROM labeled GROUP BY channel
ORDER BY channel ASC NULLS LAST
"""


QUERIES = {
    "events_asof_purchase": events_asof_purchase,
    "events_attribution": events_attribution,
    "events_value_bands": events_value_bands,
    "events_multigrain": events_multigrain,
    "events_scd2": events_scd2,
    "events_scd2_lookup": events_scd2_lookup,
}

ORACLE_SQL = {
    "events_asof_purchase": ASOF_ORACLE,
    "events_attribution": ATTRIBUTION_ORACLE,
    "events_value_bands": BANDS_ORACLE,
    "events_multigrain": MULTIGRAIN_ORACLE,
    "events_scd2": SCD2_ORACLE,
    "events_scd2_lookup": SCD2_LOOKUP_ORACLE,
}
