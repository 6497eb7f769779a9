"""Deep TPC-H-shape OLAP surface (round 4): the remaining canonical
decision-support query shapes the engine should speak natively —
returned-item ranking (Q10), promo-revenue ratio (Q14), multi-way
market-share (Q8), supplier-count grouping with NOT-IN exclusion (Q16),
OR-of-ANDs predicate revenue (Q19), and idle-customer detection with a
scalar-subquery threshold (Q22).  The reference pipeline has no OLAP
surface of this kind (SURVEY §2.10); these extend the engine the same way
``analytics.py`` does, adapted to the test lake's columns (no partsupp
table — the observed lineitem (partkey, suppkey) pairs stand in for it;
no phone country codes — market segment stands in for them).

Money math follows the repo-wide rule: quantize per row to integer cents
with ``floor(x*100 + 0.5)`` (bit-identical across engines), aggregate
exactly in BIGINT, and express ratios as integer parts-per-million via
integer division — no float aggregate ever decides a row's fate, so the
DuckDB oracle matches hash-for-hash.

Scale notes (100 TB): every query is broadcast-dim + shuffle-on-key
shaped.  Fact-fact joins (lineitem ⨝ orders) shuffle on the join key with
partial aggregation pushed below the exchange where Catalyst can; all
region/nation dims broadcast explicitly; part and customer broadcast at
test SF via AQE but degrade gracefully to shuffle joins at full scale.
Selective filters (return flag, date windows, brand lists) sit directly
on the scans — `.explain` shows them in PushedFilters, so row-group
pruning does the heavy lifting before any join.  Top-k outputs plan as
TakeOrderedAndProject (per-partition heap + k-row merge), never a global
sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table

# The repo-wide revenue-quantization rule lives in analytics.py — import
# it rather than restate it, so a change to the money math reaches every
# OLAP module at once.
from .analytics import _REV
from .analytics import _revenue_cents as _rev_cents

# --- Q10: returned-item revenue ranking ---------------------------------

RETURNED_DATE_LO = "1998-01-01"
RETURNED_DATE_HI = "1999-01-01"
RETURNED_TOP_K = 20


def returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items in a one-year order window.

    Plan shape: the returnflag filter and the order-date range both reach
    their parquet scans; lineitem ⨝ orders shuffles on orderkey with the
    date-filtered orders side already pruned; customer joins on custkey;
    nation broadcasts.  The final top-20 is TakeOrderedAndProject.
    """
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= RETURNED_DATE_LO)
        & (F.col("o_orderdate") < RETURNED_DATE_HI)
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rev_cents", _rev_cents())
        .groupBy(
            "c_custkey",
            "c_name",
            F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("acctbal_cents"),
            "n_name",
        )
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("rev_cents"), F.asc("c_custkey"))
        .limit(RETURNED_TOP_K)
    )


_RETURNED_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents,
       n.n_name,
       CAST(SUM({_REV}) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '{RETURNED_DATE_LO}'
  AND o.o_orderdate < DATE '{RETURNED_DATE_HI}'
GROUP BY 1, 2, 3, 4
ORDER BY rev_cents DESC, c_custkey ASC
LIMIT {RETURNED_TOP_K}
"""

# --- Q14: promo revenue ratio -------------------------------------------

PROMO_DATE_LO = "1997-01-01"
PROMO_DATE_HI = "1997-07-01"
PROMO_TYPE = "PROMO"


def promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: what fraction of a ship-window's revenue came
    from promotional parts — a conditional-sum ratio over a fact ⨝ dim
    join.

    The ratio is integer parts-per-million (``div(promo*1e6, total)``),
    never a float division, so the single output row hashes identically
    in both engines.  Part broadcasts at test SF via AQE; at 100 TB the
    join degrades to a shuffle hash join on partkey — still one
    exchange, and the date filter has already cut lineitem to the
    window at the scan.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= PROMO_DATE_LO) & (F.col("l_shipdate") < PROMO_DATE_HI)
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .withColumn("rev_cents", _rev_cents())
        .agg(
            F.sum(
                F.when(F.col("p_type") == PROMO_TYPE, F.col("rev_cents")).otherwise(
                    F.lit(0)
                )
            ).alias("promo_cents"),
            F.sum("rev_cents").alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.expr("div(promo_cents * 1000000, total_cents)").alias("promo_ppm"),
        )
    )


_PROMO_ORACLE = f"""
WITH agg AS (
    SELECT
        CAST(SUM(CASE WHEN p.p_type = '{PROMO_TYPE}' THEN {_REV} ELSE 0 END)
             AS BIGINT) AS promo_cents,
        CAST(SUM({_REV}) AS BIGINT) AS total_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '{PROMO_DATE_LO}'
      AND l.l_shipdate < DATE '{PROMO_DATE_HI}'
)
SELECT promo_cents, total_cents,
       promo_cents * 1000000 // total_cents AS promo_ppm
FROM agg
"""

# --- Q8: market share ----------------------------------------------------

SHARE_REGION = "ASIA"
SHARE_NATION = "NATION_7"


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per order-year, the share of revenue that
    suppliers from one nation captured among customers of one region —
    the widest join in the suite (lineitem ⨝ orders ⨝ customer ⨝
    nation ⨝ region on the demand side, ⨝ supplier ⨝ nation on the
    supply side).

    Plan shape: the two nation copies and region broadcast (they are
    bounded dims forever); supplier and customer join on their keys;
    the only large shuffles are the two fact-side key exchanges.  The
    share is integer ppm per year — exact, order-independent.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == SHARE_REGION)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))
        .withColumn("rev_cents", _rev_cents())
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(
                    F.col("supp_nation") == SHARE_NATION, F.col("rev_cents")
                ).otherwise(F.lit(0))
            ).alias("nation_cents"),
            F.sum("rev_cents").alias("total_cents"),
        )
        .select(
            "o_year",
            "nation_cents",
            "total_cents",
            F.expr("div(nation_cents * 1000000, total_cents)").alias("share_ppm"),
        )
        .orderBy("o_year")
    )


_SHARE_ORACLE = f"""
WITH agg AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN ns.n_name = '{SHARE_NATION}' THEN {_REV} ELSE 0 END)
                AS BIGINT) AS nation_cents,
           CAST(SUM({_REV}) AS BIGINT) AS total_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN region r ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = '{SHARE_REGION}'
    GROUP BY 1
)
SELECT o_year, nation_cents, total_cents,
       nation_cents * 1000000 // total_cents AS share_ppm
FROM agg
ORDER BY o_year
"""

# --- Q16: supplier counts per part group with exclusions -----------------

SUPPCNT_EXCL_BRAND = "Brand#9"
SUPPCNT_EXCL_TYPE = "PROMO"


def supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can furnish each
    (brand, type, size) part group, excluding one brand, one type, and
    all "complaint" suppliers (negative account balance) — the NOT-IN
    exclusion expressed as a broadcast anti-join.

    The lake has no partsupp table; the distinct (l_partkey, l_suppkey)
    pairs observed in lineitem stand in for it (noted in the module
    docstring).  The distinct pre-aggregation happens BEFORE the part
    join, so the count-distinct shuffle carries pair keys, not raw
    lineitem rows.
    """
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != SUPPCNT_EXCL_BRAND)
        & (F.col("p_type") != SUPPCNT_EXCL_TYPE)
    )
    return (
        pairs.join(
            F.broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti"
        )
        .join(p, pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_SUPPCNT_ORACLE = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> '{SUPPCNT_EXCL_BRAND}'
  AND p.p_type <> '{SUPPCNT_EXCL_TYPE}'
  AND ps.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# --- Q19: OR-of-ANDs predicate revenue ----------------------------------

SPECIAL_CASES = (
    ("Brand#1", 1, 15, 1.0, 20.0),
    ("Brand#2", 10, 30, 10.0, 30.0),
    ("Brand#3", 20, 50, 20.0, 40.0),
)


def special_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive brand/size/
    quantity windows — the classic OR-of-ANDs predicate that exercises
    filter factoring.  The common conjuncts Catalyst can factor out
    (the join key equality) stay in the join; the disjunction evaluates
    post-join on already-pruned columns.  Output is one exact row
    (revenue cents + matched item count) per brand case plus the total.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    case_col = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in SPECIAL_CASES:
        cond = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(qty_lo, qty_hi)
        )
        case_col = (
            F.when(cond, brand) if case_col is None else case_col.when(cond, brand)
        )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .withColumn("brand_case", case_col)
        .where(F.col("brand_case").isNotNull())
        .withColumn("rev_cents", _rev_cents())
        .groupBy("brand_case")
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("brand_case")
    )


def _special_oracle() -> str:
    whens = "\n".join(
        f"WHEN p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
        f"AND l.l_quantity BETWEEN {qlo} AND {qhi} THEN '{b}'"
        for b, slo, shi, qlo, qhi in SPECIAL_CASES
    )
    return f"""
WITH tagged AS (
    SELECT CASE {whens} END AS brand_case, {_REV} AS rev_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT brand_case, CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_items
FROM tagged
WHERE brand_case IS NOT NULL
GROUP BY brand_case
ORDER BY brand_case
"""

# --- Q22: idle high-balance customers ------------------------------------

IDLE_CUTOFF = "2000-08-01"


def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose balance beats the average
    positive balance but who placed no order after a cutoff date —
    a scalar-subquery threshold plus an anti-join, grouped by market
    segment (the lake's stand-in for country codes).

    The above-average test is exact-integer: ``bal_cents * n_pos >
    sum_pos_cents`` — the scalar aggregate broadcasts as a one-row
    cross join, never a float mean.  Recent orders prune at the scan
    (date pushdown) before the anti-join builds its hash table.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("bal_cents"),
    )
    thresh = c.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_pos"), F.count(F.lit(1)).alias("n_pos")
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= IDLE_CUTOFF
    )
    return (
        c.join(F.broadcast(thresh))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("bal_cents").alias("total_cents"),
        )
        .orderBy("c_mktsegment")
    )


_IDLE_ORACLE = f"""
WITH cb AS (
    SELECT c_custkey, c_mktsegment,
           CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
    FROM customer
),
t AS (
    SELECT CAST(SUM(bal_cents) AS BIGINT) AS sum_pos, COUNT(*) AS n_pos
    FROM cb WHERE bal_cents > 0
)
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(bal_cents) AS BIGINT) AS total_cents
FROM cb, t
WHERE bal_cents * n_pos > sum_pos
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = cb.c_custkey
        AND o.o_orderdate >= DATE '{IDLE_CUTOFF}'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- Q15: top supplier(s) of a quarter -----------------------------------

TOPSUPP_DATE_LO = "1997-01-01"
TOPSUPP_DATE_HI = "1997-04-01"


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the quarter's MAXIMUM
    shipped revenue — the create-view-then-scalar-max pattern, expressed
    as one grouped aggregate reused twice (Catalyst materializes the
    revenue frame once under AQE; the max is a one-row broadcast, the
    classic argmax-via-scalar-subquery without a window over the whole
    frame).  Ties all surface (revenue equality is exact in cents)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= TOPSUPP_DATE_LO)
        & (F.col("l_shipdate") < TOPSUPP_DATE_HI)
    )
    rev = (
        l.withColumn("rev_cents", _rev_cents())
        .groupBy("l_suppkey")
        .agg(F.sum("rev_cents").alias("total_rev_cents"))
    )
    mx = rev.agg(F.max("total_rev_cents").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_rev_cents") == F.col("max_rev"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey"),
            "s_name",
            "total_rev_cents",
        )
        .orderBy("s_suppkey")
    )


_TOPSUPP_ORACLE = f"""
WITH rev AS (
    SELECT l_suppkey, CAST(SUM({_REV}) AS BIGINT) AS total_rev_cents
    FROM lineitem
    WHERE l_shipdate >= DATE '{TOPSUPP_DATE_LO}'
      AND l_shipdate < DATE '{TOPSUPP_DATE_HI}'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev_cents
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev_cents = (SELECT MAX(total_rev_cents) FROM rev)
ORDER BY s.s_suppkey
"""

# --- Association rules (market-basket) ------------------------------------

RULES_SUPPORT_MIN = 2
RULES_TOP_K = 50


def part_affinity_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over co-ordered parts: for every directed
    rule a→b with pair support ≥ RULES_SUPPORT_MIN, confidence
    (``P(b|a)``) and lift (``P(b|a)/P(b)``) in exact integer ppm; top-50
    by lift.  The classic a-priori first level — candidate generation IS
    the supported-pair self-join (never all pairs: the support filter
    prunes before scoring), item supports are one groupBy, and the
    order-count is a one-row broadcast.

    ``lift_ppm = div(s_ab · N · 1e6, s_a · s_b)`` — products bounded by
    N²·1e6 (decimal-free to ~10⁶ baskets; past that the same plan runs
    with the operands pre-divided or DECIMAL, noted here for honesty).
    Deterministic total order: (lift desc, conf desc, a, b).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.count(F.lit(1)).alias("s_item")
    )
    r = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    pairs = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
        .join(r, "o")
        .where(F.col("a") != F.col("b"))  # directed: both a→b and b→a
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .where(F.col("s_ab") >= RULES_SUPPORT_MIN)
    )
    sa = item.select(F.col("item").alias("a"), F.col("s_item").alias("s_a"))
    sb = item.select(F.col("item").alias("b"), F.col("s_item").alias("s_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            "s_ab",
            "s_a",
            "s_b",
            F.expr("div(s_ab * 1000000, s_a)").alias("conf_ppm"),
            F.expr("div(s_ab * n_orders * 1000000, s_a * s_b)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.desc("lift_ppm"), F.desc("conf_ppm"), "a", "b")
        .limit(RULES_TOP_K)
    )


_RULES_ORACLE = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
item AS (
    SELECT l_partkey AS item, COUNT(*) AS s_item FROM li GROUP BY 1
),
pairs AS (
    SELECT a.l_partkey AS a, b.l_partkey AS b, COUNT(*) AS s_ab
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {RULES_SUPPORT_MIN}
)
SELECT p.a, p.b, CAST(p.s_ab AS BIGINT) AS s_ab,
       CAST(ia.s_item AS BIGINT) AS s_a,
       CAST(ib.s_item AS BIGINT) AS s_b,
       p.s_ab * 1000000 // ia.s_item AS conf_ppm,
       p.s_ab * (SELECT n_orders FROM n) * 1000000
           // (ia.s_item * ib.s_item) AS lift_ppm
FROM pairs p
JOIN item ia ON ia.item = p.a
JOIN item ib ON ib.item = p.b
ORDER BY lift_ppm DESC, conf_ppm DESC, a, b
LIMIT {RULES_TOP_K}
"""


# --- Q17: small-quantity revenue ------------------------------------------


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity — the correlated-aggregate
    filter, decorrelated into one per-part aggregate joined back.

    Exactness: ``qty < 0.2 · avg(qty)`` is rewritten
    ``5 · qty · n > 0 ∧ 5 · qty · n < Σqty`` in BIGINTs (quantities are
    integral in this lake) — no float mean, no 0.2 literal.  One
    partial-agg shuffle on partkey for the stats, one equi-join back
    (same key — AQE reuses the partitioning), one global sum.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _rev_cents().alias("rev_cents"),
    )
    stats = l.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("n_items")
    )
    return (
        l.join(stats, "l_partkey")
        .where(F.lit(5) * F.col("qty") * F.col("n_items") < F.col("sum_qty"))
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


_SMALLQTY_ORACLE = f"""
WITH l AS (
    SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
           {_REV} AS rev_cents
    FROM lineitem
),
stats AS (
    SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_items
    FROM l GROUP BY l_partkey
)
SELECT CAST(SUM(l.rev_cents) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_small
FROM l JOIN stats USING (l_partkey)
WHERE 5 * l.qty * stats.n_items < stats.sum_qty
"""

# --- Q4: late-shipment order-priority census ------------------------------

LATE_SHIP_DAYS = 90


def priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders have at least
    one lineitem shipped more than LATE_SHIP_DAYS after the order date —
    the EXISTS correlated subquery, planned as a left-semi join (build on
    the date-filtered pair set, no row explosion; the lake has no
    commit/receipt dates, so ship-lag stands in, noted here).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .where(
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate"), LATE_SHIP_DAYS)
        )
        .select("o_orderkey")
        .distinct()
    )
    return (
        o.join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


_LATE_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Cohort lifetime value -------------------------------------------------


def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by FIRST-order
    year (the cohort), revenue accumulated per order-age year — the
    commerce twin of ``events_retention``'s (cohort × offset) census.

    Plan: one customer-keyed aggregate finds each customer's cohort
    year; the join back to orders is an equi-join on custkey (the
    cohort frame is |customers| rows — shuffles, or broadcasts under
    AQE when it fits); the matrix aggregate shuffles |cohorts × ages| ≤
    a few dozen groups with map-side combine.  Exact cents throughout.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("yr").alias("cohort_year"))
    return (
        o.join(cohort, "o_custkey")
        .groupBy(
            "cohort_year", (F.col("yr") - F.col("cohort_year")).alias("age_years")
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").alias("rev_cents"),
        )
        .orderBy("cohort_year", "age_years")
    )


_COHORT_ORACLE = """
WITH o AS (
    SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM orders
),
cohort AS (
    SELECT o_custkey, MIN(yr) AS cohort_year FROM o GROUP BY o_custkey
)
SELECT c.cohort_year, o.yr - c.cohort_year AS age_years,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(SUM(o.price_cents) AS BIGINT) AS rev_cents
FROM o JOIN cohort c USING (o_custkey)
GROUP BY 1, 2
ORDER BY 1, 2
"""

# --- Supplier concentration (HHI) -----------------------------------------


def supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration (Herfindahl–Hirschman) index per part type:
    each supplier's revenue share of the type in ppm, squared and summed
    — ``HHI_e12 = Σ share_ppm²`` (10¹² = monopoly).  The antitrust-style
    concentration census, all in exact integers: shares are integer ppm
    of exact cent totals, so the squared sum is reproducible bit-for-bit
    at any aggregation order.

    Plan: one (type, supplier) partial-agg shuffle, a |types|-row total
    broadcast-joined back, and a |types × suppliers|-group final sum.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    by_supp = (
        l.join(p, l.l_partkey == p.p_partkey)
        .withColumn("rev_cents", _rev_cents())
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("rev_cents").alias("rev"))
    )
    totals = by_supp.groupBy("p_type").agg(F.sum("rev").alias("total"))
    return (
        by_supp.join(F.broadcast(totals), "p_type")
        .withColumn("share_ppm", F.expr("div(rev * 1000000, total)"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("share_ppm") * F.col("share_ppm")).alias("hhi_e12"),
        )
        .orderBy("p_type")
    )


_HHI_ORACLE = f"""
WITH by_supp AS (
    SELECT p.p_type, l.l_suppkey, CAST(SUM({_REV}) AS BIGINT) AS rev
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
),
tot AS (SELECT p_type, CAST(SUM(rev) AS BIGINT) AS total FROM by_supp GROUP BY 1),
shares AS (
    SELECT b.p_type, b.rev * 1000000 // t.total AS share_ppm
    FROM by_supp b JOIN tot t USING (p_type)
)
SELECT p_type, COUNT(*) AS n_suppliers,
       CAST(SUM(share_ppm * share_ppm) AS BIGINT) AS hhi_e12
FROM shares GROUP BY p_type ORDER BY p_type
"""

# --- RFM customer segmentation --------------------------------------------


def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1–4 on Recency (days
    since last order, relative to the lake's max order date — an in-plan
    one-row aggregate, never a driver-side clock), Frequency (order
    count) and Monetary (total cents), quartiled with ntile(4) over
    DETERMINISTIC total orders (metric + custkey tie-break, so both
    engines bucket identically), combined into the classic 3-digit code.

    Plan: one customer-keyed aggregate, a one-row broadcast for the
    reference date, three ntile windows sharing one global sort domain
    each (|customers| rows — at true scale these become range-partitioned
    window sorts, the standard distributed ntile), narrow code projection.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
        ).alias("monetary_cents"),
    )
    ref = o.agg(F.max("o_orderdate").alias("ref_date"))
    base = per_cust.crossJoin(F.broadcast(ref)).select(
        "o_custkey",
        F.datediff(F.col("ref_date"), F.col("last_order"))
        .cast("long")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.desc("monetary_cents"), F.asc("o_custkey"))
    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        (
            F.ntile(4).over(w_r) * 100
            + F.ntile(4).over(w_f) * 10
            + F.ntile(4).over(w_m)
        )
        .cast("int")
        .alias("rfm_code"),
    )


_RFM_ORACLE = """
WITH per_cust AS (
    SELECT o_custkey, MAX(o_orderdate) AS last_order,
           COUNT(*) AS frequency,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS monetary_cents
    FROM orders GROUP BY o_custkey
),
base AS (
    SELECT o_custkey,
           CAST(datediff('day', last_order,
                         (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT)
               AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary_cents
    FROM per_cust
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       CAST(NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) * 100
            + NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) * 10
            + NTILE(4) OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
            AS INT) AS rfm_code
FROM base
"""

# --- Benford first-digit audit --------------------------------------------

# floor(log10(1 + 1/d) · 1e6) for d = 1..9 — precomputed so neither engine
# ever evaluates a log.
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def lineitem_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over extended prices — the fraud /
    data-generation-artifact detector: observed leading-digit frequency
    in ppm against the Benford expectation (precomputed integer
    constants — no log in-plan).  Synthetic uniform-ish prices FAIL
    Benford loudly, which is itself the point: the operator flags
    non-natural distributions.

    Plan: one narrow digit projection + a 9-group aggregate with
    map-side combine; the total is a window over the 9-row frame.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        F.substring(
            F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counts = l.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    expected = None
    for d, ppm in BENFORD_PPM.items():
        expected = (
            F.when(F.col("digit") == d, F.lit(ppm))
            if expected is None
            else expected.when(F.col("digit") == d, F.lit(ppm))
        )
    return (
        counts.withColumn("observed_ppm", F.expr("div(n * 1000000, sum(n) over ())"))
        .select(
            "digit",
            "n",
            "observed_ppm",
            expected.cast("long").alias("benford_ppm"),
            (F.col("observed_ppm") - expected).cast("long").alias("diff_ppm"),
        )
        .orderBy("digit")
    )


def _benford_oracle_sql() -> str:
    whens = " ".join(
        f"WHEN digit = {d} THEN {ppm}" for d, ppm in BENFORD_PPM.items()
    )
    return f"""
WITH l AS (
    SELECT CAST(substr(CAST(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
                                 AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit
    FROM lineitem
),
c AS (SELECT digit, COUNT(*) AS n FROM l GROUP BY digit)
SELECT digit, n,
       CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS observed_ppm,
       CAST(CASE {whens} END AS BIGINT) AS benford_ppm,
       CAST(n * 1000000 // SUM(n) OVER ()
            - CASE {whens} END AS BIGINT) AS diff_ppm
FROM c ORDER BY digit
"""


# --- Q13: customer order-count distribution -------------------------------


def cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the histogram of customers by how many orders
    they placed — INCLUDING zero-order customers, which is what makes
    this the canonical left-outer-join-then-double-aggregate: customer
    ⟕ orders counted per customer (a left join so order-less customers
    keep a 0), then the counts themselves grouped into the distribution.

    Plan: the join shuffles on custkey (orders side pre-aggregated to
    per-customer counts first, so the join carries |customers| rows, not
    |orders|); the second aggregate runs over the |distinct counts| ≤
    max-orders-per-customer domain — broadcast-sized forever."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_CUSTDIST_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- In-engine OLS: discount → quantity elasticity ------------------------


def discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand ordinary-least-squares fit of quantity on discount —
    in-engine regression from EXACT integer sufficient statistics:
    x = discount in e2 fixed point (0–10), y = integral quantity;
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` with every Σ an exact
    BIGINT from ONE map-side-combinable aggregate, and only the final
    slope/intercept divisions in doubles (identical operands in both
    engines — the repo's standard last-mile float contract).  Output
    slope/intercept in e6 fixed point, plus n.

    This is the distributed-ML primitive shape: sufficient statistics
    reduce (one shuffle, tiny result), model math on the reduced frame.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        l.join(p, l.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.floor(F.col("l_discount") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("x"),
            F.col("l_quantity").cast("long").alias("y"),
        )
    )
    stats = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_e6 = F.floor(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        * F.lit(1_000_000.0)
        / det.cast("double")
    ).cast("long")
    intercept_e6 = F.floor(
        (F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy")).cast("double")
        * F.lit(1_000_000.0)
        / det.cast("double")
    ).cast("long")
    return (
        stats.where(det > 0)  # degenerate single-discount brands excluded
        .select(
            "p_brand",
            "n",
            slope_e6.alias("slope_e6"),
            intercept_e6.alias("intercept_e6"),
        )
        .orderBy("p_brand")
    )


_ELASTICITY_ORACLE = """
WITH base AS (
    SELECT p.p_brand,
           CAST(FLOOR(l.l_discount * 100.0 + 0.5) AS BIGINT) AS x,
           CAST(l.l_quantity AS BIGINT) AS y
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
stats AS (
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM base GROUP BY p_brand
)
SELECT p_brand, n,
       CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
           AS slope_e6,
       CAST(FLOOR(CAST(sxx * sy - sx * sxy AS DOUBLE) * 1000000.0
                  / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
           AS intercept_e6
FROM stats
WHERE n * sxx - sx * sx > 0
ORDER BY p_brand
"""


# --- Q6: forecast revenue change (round 5) ------------------------------

FORECAST_DATE_LO = "1996-01-01"
FORECAST_DATE_HI = "1997-01-01"
FORECAST_DISC_LO = 0.04
FORECAST_DISC_HI = 0.07
FORECAST_QTY_LT = 24.0


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue that WOULD be recovered by dropping a
    discount band — one conditional aggregate over a single scan, the
    simplest possible plan and the purest pushdown check: all three
    predicates (ship-year, discount band, quantity cap) must reach the
    parquet scan as PushedFilters, and the whole query is a scan +
    partial agg + 1-row exchange.  The summand quantizes
    ``l_extendedprice * l_discount`` per row to integer cents (the same
    double multiply then floor in both engines — bit-identical), so the
    BIGINT sum hashes exactly.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= FORECAST_DATE_LO)
        & (F.col("l_shipdate") < FORECAST_DATE_HI)
        & (F.col("l_discount") >= FORECAST_DISC_LO)
        & (F.col("l_discount") <= FORECAST_DISC_HI)
        & (F.col("l_quantity") < FORECAST_QTY_LT)
    )
    return l.agg(
        F.coalesce(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * F.col("l_discount") * 100.0
                    + F.lit(0.5)
                ).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("forecast_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


_FORECAST_ORACLE = f"""
SELECT COALESCE(CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100.0
                                    + 0.5) AS BIGINT)) AS BIGINT),
                0) AS forecast_cents,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '{FORECAST_DATE_LO}'
  AND l_shipdate < DATE '{FORECAST_DATE_HI}'
  AND l_discount >= {FORECAST_DISC_LO}
  AND l_discount <= {FORECAST_DISC_HI}
  AND l_quantity < {FORECAST_QTY_LT}
"""

# --- Q7: volume shipping between two nations (round 5) ------------------

VOLUME_NATION_A = "NATION_1"
VOLUME_NATION_B = "NATION_2"
VOLUME_DATE_LO = "1996-01-01"
VOLUME_DATE_HI = "1998-01-01"


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue shipped between
    two specific nations, in either direction, by ship year.  The
    double-role nation dim (supplier's nation AND customer's nation in
    one query) is the shape's point: the same tiny table joined twice
    under different aliases, with an OR-of-two-AND-pairs predicate that
    spans both roles.

    Join order (round 6, VERDICT r5 #2): the OR decomposes into an
    implied ``n_name IN (A, B)`` on EACH nation role, so both dims are
    pre-filtered to the two nations and joined onto their fact side
    BEFORE the fact-fact orderkey shuffle — the nation-filtered
    supplier broadcasts onto lineitem (cuts the shuffled lineitems to
    the two nations' suppliers, ~2/25 at TPC-H nation cardinality) and
    the nation-filtered customer cuts orders the same way.  Only then
    do the two reduced sides meet on orderkey; the cross-role OR pair
    filter runs after, on the already-tiny joined frame.  Catalyst
    would need CBO stats to find this order on its own.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= VOLUME_DATE_LO)
        & (F.col("l_shipdate") < VOLUME_DATE_HI)
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = [VOLUME_NATION_A, VOLUME_NATION_B]
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin(pair))
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin(pair))
    pair_ok = (
        (F.col("supp_nation") == VOLUME_NATION_A)
        & (F.col("cust_nation") == VOLUME_NATION_B)
    ) | (
        (F.col("supp_nation") == VOLUME_NATION_B)
        & (F.col("cust_nation") == VOLUME_NATION_A)
    )
    # Two-nation supplier slice: tiny by construction, broadcast onto
    # the (date-pruned) lineitem scan so the orderkey exchange only
    # carries the two nations' suppliers' lineitems.
    s_pair = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    # Same cut on the orders side: customers of the two nations only.
    # No broadcast hint here — customer is fact-sized at 100 TB, so the
    # 2/25 slice may not fit a broadcast; AQE converts this join to
    # broadcast at small SF and keeps a (reduced) custkey shuffle at
    # scale, which is the right call either way.
    c_pair = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key")).select(
        "c_custkey", "cust_nation"
    )
    o_pair = o.join(c_pair, o.o_custkey == c_pair.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    return (
        l.join(F.broadcast(s_pair), l.l_suppkey == s_pair.s_suppkey)
        .join(o_pair, l.l_orderkey == o_pair.o_orderkey)
        .where(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(_rev_cents_sum())
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def _rev_cents_sum() -> F.Column:
    return F.sum(_rev_cents()).alias("rev_cents")


_VOLUME_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(YEAR(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM({_REV}) AS BIGINT) AS rev_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= DATE '{VOLUME_DATE_LO}'
  AND l.l_shipdate < DATE '{VOLUME_DATE_HI}'
  AND ((sn.n_name = '{VOLUME_NATION_A}' AND cn.n_name = '{VOLUME_NATION_B}')
    OR (sn.n_name = '{VOLUME_NATION_B}' AND cn.n_name = '{VOLUME_NATION_A}'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

# --- Q18: large-volume orders (round 5) ---------------------------------

LARGE_QTY_GT_E2 = 80_00  # total order quantity > 80 units (e2 fixed point)
LARGE_TOP_K = 100


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose TOTAL quantity exceeds a threshold,
    with their customers — the aggregate-then-semi-join shape (the
    spec's ``o_orderkey IN (SELECT … GROUP BY … HAVING)``).

    Decorrelated Spark form: one partial-agg shuffle computes per-order
    quantity totals, the HAVING filter cuts it to the (rare) big orders,
    and that small set joins orders ⨝ customer — at 100 TB the
    aggregated-and-filtered side is small enough for AQE to broadcast,
    turning the spec's IN-subquery into a broadcast semi-join, which is
    exactly how an optimizer should execute Q18.  Quantities quantize to
    e2 fixed point per row and sum in BIGINT (exact, order-independent).
    """
    l = load_table(spark, sf_dir, "lineitem")
    totals = (
        l.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast("long")
            ).alias("qty_e2")
        )
        .where(F.col("qty_e2") > LARGE_QTY_GT_E2)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        totals.join(o, totals.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("orderdate_us"),
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("totalprice_cents"),
            "qty_e2",
        )
        .orderBy(F.desc("totalprice_cents"), F.asc("l_orderkey"))
        .limit(LARGE_TOP_K)
    )


_LARGE_ORACLE = f"""
WITH totals AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS qty_e2
    FROM lineitem GROUP BY 1
    HAVING qty_e2 > {LARGE_QTY_GT_E2}
)
SELECT c.c_custkey, c.c_name, t.l_orderkey,
       epoch_us(o.o_orderdate) AS orderdate_us,
       CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
           AS totalprice_cents,
       t.qty_e2
FROM totals t
JOIN orders o ON t.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice_cents DESC, l_orderkey ASC
LIMIT {LARGE_TOP_K}
"""

# --- Q21: suppliers who kept orders waiting (round 5) -------------------

WAIT_LATE_DAYS = 90  # adapted lateness: shipped > 90 days after the order
WAIT_TOP_K = 20


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order — the canonical double-correlated EXISTS /
    NOT-EXISTS query, decorrelated.  (The lake has no commit/receipt
    dates; lateness adapts to ``l_shipdate > o_orderdate + 90 days``,
    applied identically in the oracle.)

    Decorrelated Spark form: ONE aggregation over the order's lineitems
    computes (distinct suppliers, distinct LATE suppliers, the late
    supplier's key via a conditional min/max pair) — both EXISTS
    conditions become HAVING predicates on that single pass
    (n_supp ≥ 2 ∧ n_late_supp = 1), and the sole-late-supplier key
    falls out of the same aggregate (min = max when exactly one).  No
    correlated re-scans, no self-joins: the spec's two subqueries cost
    one partial-agg shuffle on orderkey.  The DuckDB oracle is written
    INDEPENDENTLY in the spec's EXISTS / NOT EXISTS form, so the hash
    gate validates the decorrelation, not a shared rewrite (same
    verification pattern as orders_skyline).
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # timestamp + interval on both engines (date_add would truncate the
    # timestamp to a date on the Spark side only)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {WAIT_LATE_DAYS} DAYS"
    )
    per_order = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(late, F.col("l_suppkey"))).alias(
                "n_late_supp"
            ),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), per_order.late_supp == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_waiting_orders"))
        .orderBy(F.desc("n_waiting_orders"), F.asc("s_suppkey"))
        .limit(WAIT_TOP_K)
    )


_WAITING_ORACLE = f"""
SELECT s.s_suppkey, s.s_name,
       CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_waiting_orders
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL {WAIT_LATE_DAYS} DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL {WAIT_LATE_DAYS} DAY)
GROUP BY 1, 2
ORDER BY n_waiting_orders DESC, s_suppkey ASC
LIMIT {WAIT_TOP_K}
"""


# --- Q2: min-cost supplier per part in a region (round 7) ----------------
#
# The lake has no partsupp/ps_supplycost; the observed (l_partkey,
# l_suppkey) pairs stand in for partsupp (module docstring) and the
# pair's supply cost is its MIN observed line price in cents — exact
# integer, so the per-part minimum is engine-neutral.

MINCOST_REGION = "EUROPE"
MINCOST_SIZE = 15
MINCOST_TYPE = "STANDARD"
MINCOST_TOP_K = 100

_PRICE_CENTS = "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)"


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part of one type under a size cap, the region's
    minimum-cost supplier(s) — the canonical CORRELATED SCALAR SUBQUERY
    on a different table (cost = the per-(part, region) minimum over
    partsupp), decorrelated.

    Decorrelated Spark form: the pair-cost table is cut to the region's
    suppliers and the filtered parts FIRST (both broadcast-sized dims
    applied below the pair aggregate, so the groupBy shuffles only the
    surviving pairs), then the per-part minimum comes from a window MIN
    over the already-aggregated pair frame — one extra exchange on
    partkey over a pairs-sized input, never a re-scan per part.  The
    ORACLE keeps the spec's correlated form (``cost = (SELECT MIN …
    WHERE ps2.partkey = p.partkey AND …region)``), so the hash gate
    validates the decorrelation itself, like tpch_waiting_suppliers.
    Ties on the minimum cost emit ALL minimal suppliers (spec
    semantics).  At 100 TB: part/supplier/nation/region broadcast; the
    only fact-sized shuffle is the pair aggregate on (partkey,
    suppkey)."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_size") <= MINCOST_SIZE)
            & (F.col("p_type") == MINCOST_TYPE)
        )
        .select("p_partkey", "p_name")
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == MINCOST_REGION
    )
    s_region = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.floor(F.col("s_acctbal") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("acctbal_cents"),
            "n_name",
        )
    )
    pair_cost = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s_region), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "p_partkey", "p_name", "s_suppkey", "s_name",
            "acctbal_cents", "n_name",
        )
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("cost_cents")
        )
    )
    min_cost = F.min("cost_cents").over(Window.partitionBy("p_partkey"))
    return (
        pair_cost.withColumn("min_cost", min_cost)
        .where(F.col("cost_cents") == F.col("min_cost"))
        .select(
            "acctbal_cents", "s_name", "n_name", "p_partkey", "p_name",
            "cost_cents",
        )
        .orderBy(
            F.desc("acctbal_cents"), "n_name", "s_name", "p_partkey"
        )
        .limit(MINCOST_TOP_K)
    )


_MINCOST_ORACLE = f"""
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN({_PRICE_CENTS}) AS cost_cents
    FROM lineitem GROUP BY 1, 2
)
SELECT CAST(FLOOR(s.s_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents,
       s.s_name, n.n_name, p.p_partkey, p.p_name, ps.cost_cents
FROM part p, ps, supplier s, nation n, region r
WHERE p.p_partkey = ps.ps_partkey
  AND s.s_suppkey = ps.ps_suppkey
  AND p.p_size <= {MINCOST_SIZE}
  AND p.p_type = '{MINCOST_TYPE}'
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND r.r_name = '{MINCOST_REGION}'
  AND ps.cost_cents = (
      SELECT MIN(ps2.cost_cents)
      FROM ps ps2, supplier s2, nation n2, region r2
      WHERE ps2.ps_partkey = p.p_partkey
        AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = '{MINCOST_REGION}')
ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT {MINCOST_TOP_K}
"""

# --- Q9: product-type profit by nation and year (round 7) ----------------

PROFIT_NAME_LIKE = "%red%"


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line, by supplier nation and
    order year — the 6-way join (lineitem, the partsupp stand-in,
    part with a LIKE filter, supplier, nation, orders) whose point is
    LIKE-filter pushdown and join ordering around two fact-sized inputs.

    Supply cost stand-in: the pair's MIN observed unit price in cents
    (min over its lineitems of floor(extendedprice/quantity·100+0.5) —
    both engines run the identical IEEE-754 divide before quantizing).
    Profit per lineitem = revenue cents − quantity × unit cost cents,
    exact BIGINT.

    Plan shape: the LIKE filter reaches the part scan and the part dim
    broadcasts onto lineitem FIRST, so the pair-cost aggregate AND the
    cost join both run on the product line's lineitems only (the pair's
    cost over red-part lineitems equals its cost over all lineitems —
    a pair belongs to exactly one part — which the oracle, whose ps CTE
    aggregates ALL pairs, verifies through the hash gate).  The
    pair-cost join reuses the (partkey, suppkey) exchange of the
    aggregate that produced it; supplier⨝nation broadcasts; the only
    other fact-fact shuffle is orderkey for the order year."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(PROFIT_NAME_LIKE))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    ucost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.floor(
                F.col("l_extendedprice") / F.col("l_quantity") * 100.0
                + F.lit(0.5)
            ).cast("long")
        ).alias("ucost_cents")
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    amount = _rev_cents() - F.col("l_quantity").cast("long") * F.col(
        "ucost_cents"
    )
    return (
        l.join(ucost, ["l_partkey", "l_suppkey"])
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("nation", "o_year", amount.alias("amount_cents"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount_cents").alias("profit_cents"))
        .orderBy("nation", F.desc("o_year"))
    )


_PROFIT_ORACLE = f"""
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100.0 + 0.5)
                    AS BIGINT)) AS ucost_cents
    FROM lineitem GROUP BY 1, 2
),
profit AS (
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           {_REV} - CAST(l.l_quantity AS BIGINT) * ps.ucost_cents
               AS amount_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '{PROFIT_NAME_LIKE}'
)
SELECT nation, o_year, CAST(SUM(amount_cents) AS BIGINT) AS profit_cents
FROM profit GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

# --- Q11: important stock in a nation (round 7) ---------------------------

STOCK_NATION = "NATION_3"
STOCK_FRAC_E4 = 10  # HAVING part_value > total_value * 10/10000 (0.1%)


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's total stock value — HAVING against a SCALAR SUBQUERY over
    the SAME aggregate (per-part value > fraction × the all-parts
    total).  Stock value stands in as the extendedprice cents shipped
    by the nation's suppliers (no ps_availqty·ps_supplycost in this
    lake).

    Spark form: ONE aggregate per grain over the nation-filtered
    lineitem — the per-part sums, and their one-row grand total
    re-aggregated FROM the per-part frame (not a second scan) — then a
    broadcast one-row cross join and an integer cross-multiplied
    HAVING (value·10⁴ > total·frac_e4: no ratio division, exact).  The
    oracle keeps the spec's scalar-subquery form.  At 100 TB the
    nation filter broadcasts onto the scan, the partkey aggregate is
    the only fact shuffle, and the total rides the aggregated frame
    (≤ |parts| rows)."""
    s_nation = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(
                    F.col("n_name") == STOCK_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(s_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("value_cents")
        )
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_cents") * 10_000
            > F.col("total_cents") * STOCK_FRAC_E4
        )
        .select("p_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


_STOCK_ORACLE = f"""
SELECT l.l_partkey AS p_partkey,
       CAST(SUM({_PRICE_CENTS}) AS BIGINT) AS value_cents
FROM lineitem l, supplier s, nation n
WHERE l.l_suppkey = s.s_suppkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_name = '{STOCK_NATION}'
GROUP BY 1
HAVING SUM({_PRICE_CENTS}) * 10000 > (
    SELECT SUM({_PRICE_CENTS}) * {STOCK_FRAC_E4}
    FROM lineitem l2, supplier s2, nation n2
    WHERE l2.l_suppkey = s2.s_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_name = '{STOCK_NATION}')
ORDER BY value_cents DESC, p_partkey
"""

# --- Q12: ship-mode priority counts (round 7) -----------------------------
#
# The lake has no l_shipmode or commit/receipt dates: l_returnflag's
# values stand in for ship modes, and "late" adapts to shipped > N days
# after the order (the same lateness adaptation as
# tpch_waiting_suppliers), applied identically in the oracle.

SHIPMODE_MODES = ("A", "N")
SHIPMODE_DATE_LO = "1997-01-01"
SHIPMODE_DATE_HI = "1998-01-01"
SHIPMODE_LATE_DAYS = 60
SHIPMODE_HIGH = ("1-URGENT", "2-HIGH")


def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship mode, how many LATE lineitems belong to
    high- vs low-priority orders — the conditional-aggregate-post-join
    pattern (two CASE sums over one join, no second pass).

    Plan shape: the mode and ship-date filters reach the lineitem scan
    (PushedFilters); the lateness predicate needs o_orderdate so it
    evaluates as the JOIN's post-condition; the two priority classes are
    conditional sums in one partial+final aggregate — the spec's two
    output columns never cost two queries."""
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin(*SHIPMODE_MODES)
        & (F.col("l_shipdate") >= SHIPMODE_DATE_LO)
        & (F.col("l_shipdate") < SHIPMODE_DATE_HI)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {SHIPMODE_LATE_DAYS} DAYS"
    )
    high = F.col("o_orderpriority").isin(*SHIPMODE_HIGH)
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(late)
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_mode")
    )


_SHIPMODE_ORACLE = f"""
SELECT l.l_returnflag AS ship_mode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN
                ({', '.join(f"'{p}'" for p in SHIPMODE_HIGH)})
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN
                ({', '.join(f"'{p}'" for p in SHIPMODE_HIGH)})
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag IN ({', '.join(f"'{m}'" for m in SHIPMODE_MODES)})
  AND l.l_shipdate >= DATE '{SHIPMODE_DATE_LO}'
  AND l.l_shipdate < DATE '{SHIPMODE_DATE_HI}'
  AND l.l_shipdate > o.o_orderdate + INTERVAL {SHIPMODE_LATE_DAYS} DAY
GROUP BY 1
ORDER BY 1
"""

# --- Q20: potential promotion suppliers (round 7) -------------------------
#
# No ps_availqty: a (part, supplier) pair's "excess stock" adapts to
# recency — the pair qualifies iff MORE than half its all-time shipped
# quantity shipped inside the promo window (2·window_qty > total_qty,
# exact e2 fixed point), over parts of one name prefix.

PROMO_SUPP_NATION = "NATION_19"
PROMO_SUPP_PREFIX = "blue"
PROMO_SUPP_DATE_LO = "1999-01-01"
PROMO_SUPP_DATE_HI = "2000-01-01"


def promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation with promotion-eligible
    stock of one product line — the spec's NESTED IN / correlated-scalar
    chain (suppkey IN pairs-of-parts-IN-likeset WHERE qty-condition on a
    correlated per-pair subquery), decorrelated to two levels of
    semi-join.

    Decorrelated Spark form: the LIKE part set broadcasts onto lineitem
    (level-1 semi-join); ONE (partkey, suppkey) aggregate computes the
    all-time and in-window quantity sums together (the correlated
    subquery pair becomes two conditional sums in one pass); the
    qualifying pairs' distinct suppkeys semi-join the nation-filtered
    supplier dim (level 2).  The ORACLE keeps the spec's nested
    IN + correlated scalar form, so the hash gate validates the
    decorrelation.  At 100 TB: part and supplier broadcast; the pair
    aggregate is the only fact shuffle; no per-pair re-scans."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"{PROMO_SUPP_PREFIX}%"))
        .select("p_partkey")
    )
    qty_e2 = F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast("long")
    in_window = (F.col("l_shipdate") >= PROMO_SUPP_DATE_LO) & (
        F.col("l_shipdate") < PROMO_SUPP_DATE_HI
    )
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(qty_e2).alias("total_qty_e2"),
            F.sum(F.when(in_window, qty_e2).otherwise(0)).alias(
                "window_qty_e2"
            ),
        )
        .where(F.col("window_qty_e2") * 2 > F.col("total_qty_e2"))
        .select("l_suppkey")
        .distinct()
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(
                    F.col("n_name") == PROMO_SUPP_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        s.join(pairs, s.s_suppkey == pairs.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


_QTY_E2 = "CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)"

_PROMO_SUPP_ORACLE = f"""
SELECT s.s_suppkey, s.s_name
FROM supplier s, nation n
WHERE s.s_nationkey = n.n_nationkey
  AND n.n_name = '{PROMO_SUPP_NATION}'
  AND s.s_suppkey IN (
      SELECT ps.l_suppkey
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      WHERE ps.l_partkey IN (
            SELECT p_partkey FROM part
            WHERE p_name LIKE '{PROMO_SUPP_PREFIX}%')
        AND (SELECT COALESCE(SUM({_QTY_E2}), 0) FROM lineitem l2
             WHERE l2.l_partkey = ps.l_partkey
               AND l2.l_suppkey = ps.l_suppkey
               AND l2.l_shipdate >= DATE '{PROMO_SUPP_DATE_LO}'
               AND l2.l_shipdate < DATE '{PROMO_SUPP_DATE_HI}') * 2
            > (SELECT SUM({_QTY_E2}) FROM lineitem l3
               WHERE l3.l_partkey = ps.l_partkey
                 AND l3.l_suppkey = ps.l_suppkey)
  )
ORDER BY s.s_suppkey
"""


QUERIES = {
    "tpch_returned_revenue": returned_revenue,
    "tpch_top_supplier": top_supplier,
    "part_affinity_rules": part_affinity_rules,
    "tpch_small_qty_revenue": small_qty_revenue,
    "tpch_priority_late_orders": priority_late_orders,
    "customer_cohort_ltv": customer_cohort_ltv,
    "supplier_concentration": supplier_concentration,
    "discount_elasticity": discount_elasticity,
    "customer_rfm": customer_rfm,
    "lineitem_benford": lineitem_benford,
    "tpch_cust_distribution": cust_distribution,
    "tpch_promo_share": promo_share,
    "tpch_market_share": market_share,
    "tpch_supplier_counts": supplier_counts,
    "tpch_special_revenue": special_revenue,
    "tpch_idle_customers": idle_customers,
    "tpch_forecast_revenue": forecast_revenue,
    "tpch_volume_shipping": volume_shipping,
    "tpch_large_orders": large_orders,
    "tpch_waiting_suppliers": waiting_suppliers,
    "tpch_min_cost_supplier": min_cost_supplier,
    "tpch_product_profit": product_profit,
    "tpch_important_stock": important_stock,
    "tpch_shipmode_priority": shipmode_priority,
    "tpch_promo_suppliers": promo_suppliers,
}

ORACLE_SQL = {
    "tpch_returned_revenue": _RETURNED_ORACLE,
    "tpch_top_supplier": _TOPSUPP_ORACLE,
    "part_affinity_rules": _RULES_ORACLE,
    "tpch_small_qty_revenue": _SMALLQTY_ORACLE,
    "tpch_priority_late_orders": _LATE_ORACLE,
    "customer_cohort_ltv": _COHORT_ORACLE,
    "supplier_concentration": _HHI_ORACLE,
    "discount_elasticity": _ELASTICITY_ORACLE,
    "customer_rfm": _RFM_ORACLE,
    "lineitem_benford": _benford_oracle_sql(),
    "tpch_cust_distribution": _CUSTDIST_ORACLE,
    "tpch_promo_share": _PROMO_ORACLE,
    "tpch_market_share": _SHARE_ORACLE,
    "tpch_supplier_counts": _SUPPCNT_ORACLE,
    "tpch_special_revenue": _special_oracle(),
    "tpch_idle_customers": _IDLE_ORACLE,
    "tpch_forecast_revenue": _FORECAST_ORACLE,
    "tpch_volume_shipping": _VOLUME_ORACLE,
    "tpch_large_orders": _LARGE_ORACLE,
    "tpch_waiting_suppliers": _WAITING_ORACLE,
    "tpch_min_cost_supplier": _MINCOST_ORACLE,
    "tpch_product_profit": _PROFIT_ORACLE,
    "tpch_important_stock": _STOCK_ORACLE,
    "tpch_shipmode_priority": _SHIPMODE_ORACLE,
    "tpch_promo_suppliers": _PROMO_SUPP_ORACLE,
}
