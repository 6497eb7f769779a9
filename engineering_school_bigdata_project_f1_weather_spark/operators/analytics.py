"""General OLAP operator surface beyond the reference's nine queries —
the shapes SURVEY §2.10 lists as absent from the reference but expected of
the engine (outer/semi/anti joins, rollup, top-k per group, multi-way
join aggregation), expressed over the TPC-H-ish test lake.

Money math: ``l_extendedprice * (1 - l_discount)`` is computed per-row in
doubles (bit-identical across engines for identical inputs), quantized to
integer cents with ``floor(x + 0.5)``, then summed exactly — aggregate
order never matters, so the DuckDB oracle matches bit-for-bit.

Scale notes: every query is the canonical distributed shape — partial+final
hash aggregation, broadcast dimensions (AQE), shuffle only on group/join
keys. ``top_orders_per_customer`` is a bounded window (rank ≤ k) that
compiles to a single shuffle on the partition key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table

TOP_ORDERS_K = 3


def _revenue_cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
        + F.lit(0.5)
    ).cast("long")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with several aggregates."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.withColumn("rev_cents", _revenue_cents())
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum("rev_cents").alias("sum_rev_cents"),
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.col("l_quantity").cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join + grouped revenue. Dimensions broadcast
    (nation/region explicitly, customer/orders via AQE stats)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("rev_cents", _revenue_cents())
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


SHIPPING_SEGMENT = "BUILDING"
SHIPPING_DATE = "1998-06-01"
SHIPPING_TOP_K = 10


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue ranking — segment-filtered
    customer ⨝ date-filtered orders ⨝ date-filtered lineitem, grouped per
    order, global top-10.

    Scale notes: both date filters reach the parquet scans (PushedFilters),
    the filtered customer dim broadcasts, and LIMIT 10 plans as
    TakeOrderedAndProject — per-partition top-10 then a 10-row merge, no
    global sort of the aggregate."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == SHIPPING_SEGMENT)
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < SHIPPING_DATE
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > SHIPPING_DATE
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rev_cents", _revenue_cents())
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum("rev_cents").alias("rev_cents"))
        .orderBy(F.desc("rev_cents"), F.asc("l_orderkey"))
        .limit(SHIPPING_TOP_K)
    )


BIG_ORDER_MIN_QTY = 250


def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — aggregate-then-filter (HAVING): orders whose
    total line quantity exceeds a threshold. The filter applies AFTER the
    grouped sum, so Catalyst plans it as partial+final agg → Filter (no
    pre-agg pushdown possible, by construction)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > BIG_ORDER_MIN_QTY)
        .orderBy("l_orderkey")
    )


def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + correlated subquery surface (spark.sql text): orders
    priced above BOTH the global average and their own customer's average
    — the two subquery flavors Catalyst de-correlates into joins (the
    correlated one becomes an aggregate + equi-join, not a per-row loop).

    The above-average predicate is evaluated in EXACT integers:
    ``price > AVG(price)`` is rewritten as
    ``price_cents * COUNT(*) > SUM(price_cents)`` so no float mean is ever
    formed — float summation order could otherwise flip rows sitting at
    the threshold between Spark and the oracle (per-row cents quantization
    is order-independent; only the aggregates needed exactness)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH oc AS (
            SELECT o_orderkey, o_custkey,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
            FROM orders_v
        )
        SELECT o_orderkey, o_custkey, price_cents
        FROM oc o
        WHERE price_cents * (SELECT COUNT(*) FROM oc)
                > (SELECT SUM(price_cents) FROM oc)
          AND price_cents * (SELECT COUNT(*) FROM oc i
                             WHERE i.o_custkey = o.o_custkey)
                > (SELECT SUM(i.price_cents) FROM oc i
                   WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )


ROLLING_DAYS = 7


def orders_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval RANGE frame: each order's trailing-7-day spend for its
    customer — ``rangeBetween`` over epoch-day ordering, so the frame is
    VALUE-based (calendar days), not row-count-based: gaps and same-day
    multiples are handled correctly, unlike rowsBetween."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("day"),
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-(ROLLING_DAYS - 1), 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("day").cast("long").alias("day"),
        "price_cents",
        F.sum("price_cents").over(w).alias("cents_7d"),
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region → nation → total) — hierarchical subtotals in one
    pass (Spark expands grouping sets; no repeated scans)."""
    base = revenue_by_nation(spark, sf_dir)
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.sum("n_items").alias("n_items"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: each customer's 3 largest orders by total price
    (cents) — single shuffle on the partition key, bounded window."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "price_cents", F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("price_cents"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_ORDERS_K)
        .select("o_custkey", "o_orderkey", "price_cents", F.col("rnk").cast("int").alias("rnk"))
    )


ANTI_PRICE_MIN = 300000.0


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no high-value order (left_anti — builds
    the hash on the filtered side, no row explosion)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > ANTI_PRICE_MIN
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def customers_with_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: customers having ≥1 order above a price threshold."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def order_fulfillment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join audit: orders vs lineitem presence, with match-side
    indicators — the reconciliation shape (which orders have no items,
    which items have no order)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey, "full_outer")
    return (
        j.select(
            F.when(F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNotNull(), "both")
            .when(F.col("o_orderkey").isNotNull(), "order_only")
            .otherwise("items_only")
            .alias("side"),
        )
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking/offset/frame window surface in one pass (SURVEY
    §2.10 lists these as absent from the reference): lag/lead offsets,
    rank/dense_rank over ties, ntile over a unique ordering, and a
    RANGE frame (peer rows share a date, so RANGE ≠ ROWS here) — all in
    ONE shuffle on the partition key (Spark fuses same-partition windows).
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "price_cents", F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    )
    by_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    by_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("price_cents")
    )
    range_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "price_cents",
        F.lag("price_cents").over(by_time).alias("prev_cents"),
        F.lead("price_cents").over(by_time).alias("next_cents"),
        F.rank().over(by_price).cast("int").alias("price_rank"),
        F.dense_rank().over(by_price).cast("int").alias("price_dense_rank"),
        F.ntile(4).over(by_time).cast("int").alias("time_quartile"),
        F.sum("price_cents").over(range_cum).alias("cents_range_cum"),
    )


def quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (quarter points only, so the
    interpolation arithmetic is exact in doubles and matches DuckDB's
    quantile_cont bit-for-bit). At 100 TB swap for approx_percentile and
    drop the oracle to a tolerance check — exact percentile requires a
    per-group sort."""
    l = load_table(spark, sf_dir, "lineitem")
    # Scalar p25/p50/p75 columns (not an array<double>): the driver's
    # canonical comparator sorts columns in pandas, which cannot hash a
    # list-typed cell. Same output shape as quantile_summary_approx.
    q = F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
    return (
        l.groupBy("l_returnflag")
        .agg(q.alias("qs"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            "l_returnflag",
            F.element_at("qs", 1).alias("p25"),
            F.element_at("qs", 2).alias("p50"),
            F.element_at("qs", 3).alias("p75"),
            "n_rows",
        )
        .orderBy("l_returnflag")
    )


def pricing_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with ``grouping_id()`` — all four
    grouping combinations in one scan (SURVEY §2.10: cube absent from the
    reference; Spark expands the grouping sets before the partial
    aggregate, so it is still a single shuffle). The grouping_id bitmask
    (first key = MSB) is ANSI, so DuckDB's GROUPING() matches bit-for-bit.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.withColumn("rev_cents", _revenue_cents())
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum("rev_cents").alias("sum_rev_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


def shipmonth_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((ship_month), (returnflag)) — two disjoint
    aggregation grains that neither ROLLUP nor CUBE can express, computed
    in one pass instead of two scans + union (the 100 TB win: the fact
    table is read once)."""
    l = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("rev_cents", _revenue_cents())
        .withColumn("ship_month", F.date_format("l_shipdate", "yyyy-MM"))
    )
    return (
        l.groupingSets(
            [["ship_month"], ["l_returnflag"]], "ship_month", "l_returnflag"
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum("rev_cents").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            "gid",
            F.col("ship_month").asc_nulls_first(),
            F.col("l_returnflag").asc_nulls_first(),
        )
    )


APPROX_QUANTILE_ATOL = 2.0  # absolute tolerance on l_quantity (domain 1..50)


def quantile_summary_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (Greenwald-Khanna
    sketch — mergeable partials, no per-group sort) for the same quarter
    points as ``quantile_summary``, each checked against the exact value
    to an absolute tolerance. Deterministic for a fixed dataset, so the
    oracle pins the verdict columns plus the exact medians."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").alias("exact"),
        F.expr(
            "approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), 1000)"
        ).alias("approx"),
    )
    ok = lambda i: (  # noqa: E731
        F.abs(F.element_at("approx", i) - F.element_at("exact", i))
        <= APPROX_QUANTILE_ATOL
    )
    return agg.select(
        "l_returnflag",
        F.element_at("exact", 1).alias("p25"),
        F.element_at("exact", 2).alias("p50"),
        F.element_at("exact", 3).alias("p75"),
        (ok(1) & ok(2) & ok(3)).alias("approx_within_tol"),
    ).orderBy("l_returnflag")


APPROX_DISTINCT_RTOL = 0.05


def distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (SURVEY §2.10: absent from the reference):
    exact COUNT(DISTINCT) on two columns in one grouped pass (Spark
    plans the multi-distinct via a single expand + two-stage aggregate),
    plus the HLL++ scale path — ``approx_count_distinct`` checked to a
    5% relative tolerance against the exact count. The tolerance verdict
    is deterministic for a fixed dataset, so the oracle pins it as a
    value (TRUE) rather than re-deriving the sketch."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.approx_count_distinct("l_partkey").alias("n_parts_approx"),
        )
        .select(
            "l_returnflag",
            "n_parts",
            "n_supps",
            (
                F.abs(F.col("n_parts_approx") - F.col("n_parts"))
                <= F.col("n_parts") * APPROX_DISTINCT_RTOL
            ).alias("approx_within_tol"),
        )
        .orderBy("l_returnflag")
    )


def orders_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: the orders not dominated on
    (earlier order date, higher total price) — order B dominates A when
    ``B.date ≤ A.date ∧ B.price ≥ A.price`` with at least one strict.
    The operator Spark lacks natively; the naive formulation is a
    quadratic NOT EXISTS self-join (which is exactly what the DuckDB
    oracle runs — an INDEPENDENT algorithm, so the hash check validates
    the rewrite, not a shared plan).

    Spark-first rewrite for this 2-D case, fully relational: a point
    survives iff its price equals the max price ON its date and strictly
    exceeds the running max over all EARLIER dates. That is one
    date-level aggregation (shuffle keyed on date, map-side combined),
    one window over the DATE-LEVEL frame — |distinct dates| rows, a
    domain that is bounded by the calendar, not by the data, so the
    single-partition running-max window costs the same at 100 TB as at
    sf0.01 — and one join back (strategy left to AQE; the date frame is
    broadcast-sized forever). Dominance is compared on exact integers
    (epoch micros, price cents). NULL in either dimension excludes the
    row in both engines (dominance is undefined on unknowns).
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull())
        .select(
            "o_orderkey",
            "o_orderdate",
            F.unix_micros(F.col("o_orderdate")).alias("ts_us"),
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        )
    )
    per_date = o.groupBy("ts_us").agg(F.max("price_cents").alias("date_max"))
    prev = Window.orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, -1
    )
    per_date = per_date.withColumn("prev_max", F.max("date_max").over(prev))
    return (
        o.join(per_date, "ts_us")
        .where(
            (F.col("price_cents") == F.col("date_max"))
            & (F.col("prev_max").isNull() | (F.col("price_cents") > F.col("prev_max")))
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "price_cents",
        )
        .orderBy("order_date", "o_orderkey")
    )


_SKYLINE_ORACLE = """
WITH o AS (
    SELECT o_orderkey, o_orderdate, epoch_us(o_orderdate) AS ts_us,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM orders
    WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
)
SELECT a.o_orderkey, strftime(a.o_orderdate, '%Y-%m-%d') AS order_date,
       a.price_cents
FROM o a
WHERE NOT EXISTS (
    SELECT 1 FROM o b
    WHERE b.ts_us <= a.ts_us AND b.price_cents >= a.price_cents
      AND (b.ts_us < a.ts_us OR b.price_cents > a.price_cents)
)
ORDER BY order_date, o_orderkey
"""


def orders_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions, integer-exact: per order
    priority, each order's ``percent_rank`` and ``cume_dist`` over price —
    computed from rank()/count() in exact ppm (``(rank−1)·1e6 //
    (n−1)``, ``n_le·1e6 // n``) rather than the engines' native
    double-valued functions, so ties and rounding are bit-identical by
    construction.  cume_dist's "rows ≤ current" count is
    ``rank + ties − 1``, obtained from the DESCENDING rank of the same
    key — two windows over ONE shuffle (same partition key).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
    )
    part = Window.partitionBy("o_orderpriority")
    asc = part.orderBy(F.asc("price_cents"))
    desc = part.orderBy(F.desc("price_cents"))
    return (
        # rank() is IntegerType — widen BEFORE the ×1e6 or it wraps at 2^31
        o.withColumn("rnk", F.rank().over(asc).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(part))
        # rows with value <= current = n - (descending rank) + 1
        .withColumn("n_le", F.col("n") - F.rank().over(desc) + 1)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "price_cents",
            # a singleton group would divide by zero (ANSI error): define
            # its percent_rank as 0, as SQL's native percent_rank does
            F.when(F.col("n") == 1, F.lit(0))
            .otherwise(F.expr("div((rnk - 1) * 1000000, n - 1)"))
            .cast("long")
            .alias("pr_ppm"),
            F.expr("div(n_le * 1000000, n)").alias("cd_ppm"),
        )
    )


_DISTRIBUTION_ORACLE = """
WITH o AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM orders
),
r AS (
    SELECT *,
           RANK() OVER (PARTITION BY o_orderpriority
                        ORDER BY price_cents ASC) AS rnk,
           RANK() OVER (PARTITION BY o_orderpriority
                        ORDER BY price_cents DESC) AS drnk,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM o
)
SELECT o_orderkey, o_orderpriority, price_cents,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE (rnk - 1) * 1000000 // (n - 1) END AS BIGINT) AS pr_ppm,
       CAST((n - drnk + 1) * 1000000 // n AS BIGINT) AS cd_ppm
FROM r
"""


QUERIES = {
    "orders_skyline": orders_skyline,
    "orders_distribution": orders_distribution,
    "tpch_pricing_summary": pricing_summary,
    "tpch_revenue_by_nation": revenue_by_nation,
    "tpch_shipping_priority": shipping_priority,
    "tpch_big_orders": big_orders,
    "orders_above_avg": orders_above_avg,
    "orders_rolling_7d": orders_rolling_7d,
    "tpch_revenue_rollup": revenue_rollup,
    "top_orders_per_customer": top_orders_per_customer,
    "join_anti_customers": customers_without_orders,
    "join_semi_customers": customers_with_high_value_orders,
    "join_outer_audit": order_fulfillment_audit,
    "window_suite": window_suite,
    "tpch_quantiles": quantile_summary,
    "tpch_cube": pricing_cube,
    "tpch_grouping_sets": shipmonth_grouping_sets,
    "tpch_distinct_parts": distinct_parts,
    "tpch_quantiles_approx": quantile_summary_approx,
}

_REV = "CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)"

ORACLE_SQL = {
    "orders_skyline": _SKYLINE_ORACLE,
    "orders_distribution": _DISTRIBUTION_ORACLE,
    "tpch_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM({_REV}) AS BIGINT) AS sum_rev_cents,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_revenue_by_nation": f"""
        SELECT r.r_name, n.n_name,
               CAST(SUM({_REV}) AS BIGINT) AS rev_cents,
               COUNT(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    "tpch_revenue_rollup": f"""
        WITH base AS (
            SELECT r.r_name, n.n_name,
                   CAST(SUM({_REV}) AS BIGINT) AS rev_cents,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
        )
        SELECT r_name, n_name,
               CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
               CAST(SUM(n_items) AS BIGINT) AS n_items
        FROM base
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "top_orders_per_customer": f"""
        SELECT o_custkey, o_orderkey,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
               CAST(rnk AS INT) AS rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC,
                         o_orderkey ASC) AS rnk
            FROM orders
        ) t WHERE rnk <= {TOP_ORDERS_K}
    """,
    "join_anti_customers": f"""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > {ANTI_PRICE_MIN})
    """,
    "join_semi_customers": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    """,
    "join_outer_audit": """
        WITH li AS (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1),
        j AS (
            SELECT CASE WHEN o.o_orderkey IS NOT NULL AND li.l_orderkey IS NOT NULL THEN 'both'
                        WHEN o.o_orderkey IS NOT NULL THEN 'order_only'
                        ELSE 'items_only' END AS side
            FROM orders o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
        )
        SELECT side, COUNT(*) AS n FROM j GROUP BY side
    """,
    "window_suite": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
               LAG(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER w_time
                   AS prev_cents,
               LEAD(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER w_time
                   AS next_cents,
               CAST(RANK() OVER w_price AS INT) AS price_rank,
               CAST(DENSE_RANK() OVER w_price AS INT) AS price_dense_rank,
               CAST(NTILE(4) OVER w_time AS INT) AS time_quartile,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    OVER w_range AS BIGINT) AS cents_range_cum
        FROM orders
        WINDOW
            w_time AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            w_price AS (PARTITION BY o_custkey
                        ORDER BY CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) DESC),
            w_range AS (PARTITION BY o_custkey ORDER BY o_orderdate
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "tpch_quantiles": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.50) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "tpch_big_orders": f"""
        SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > {BIG_ORDER_MIN_QTY}
        ORDER BY l_orderkey
    """,
    "orders_above_avg": """
        -- integer-exact above-average: price*n > sum, never a float mean
        WITH oc AS (
            SELECT o_orderkey, o_custkey,
                   CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
            FROM orders
        )
        SELECT o_orderkey, o_custkey, price_cents
        FROM oc o
        WHERE price_cents * (SELECT COUNT(*) FROM oc)
                > (SELECT SUM(price_cents) FROM oc)
          AND price_cents * (SELECT COUNT(*) FROM oc i
                             WHERE i.o_custkey = o.o_custkey)
                > (SELECT SUM(i.price_cents) FROM oc i
                   WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
    """,
    "orders_rolling_7d": f"""
        SELECT o_custkey, o_orderkey,
               CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS day,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
                   RANGE BETWEEN {ROLLING_DAYS - 1} PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cents_7d
        FROM orders
    """,
    "tpch_shipping_priority": f"""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               o_orderpriority,
               CAST(SUM({_REV}) AS BIGINT) AS rev_cents
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = '{SHIPPING_SEGMENT}'
          AND o_orderdate < DATE '{SHIPPING_DATE}'
          AND l_shipdate > DATE '{SHIPPING_DATE}'
        GROUP BY 1, 2, 3
        ORDER BY rev_cents DESC, l_orderkey ASC
        LIMIT {SHIPPING_TOP_K}
    """,
    "tpch_cube": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM({_REV}) AS BIGINT) AS sum_rev_cents,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "tpch_grouping_sets": f"""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_returnflag,
               CAST(GROUPING(ship_month, l_returnflag) AS INT) AS gid,
               CAST(SUM({_REV}) AS BIGINT) AS rev_cents,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((ship_month), (l_returnflag))
    """,
    "tpch_distinct_parts": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               TRUE AS approx_within_tol
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "tpch_quantiles_approx": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.50) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               TRUE AS approx_within_tol
        FROM lineitem
        GROUP BY l_returnflag
    """,
}
