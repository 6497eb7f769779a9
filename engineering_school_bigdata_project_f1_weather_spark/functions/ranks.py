"""Exact distributed global rank — the scale-safe replacement for
empty-partitionBy windows (round 10, VERDICT r9 item 1).

``ntile(k).over(Window.orderBy(...))`` and ``row_number().over(
Window.orderBy(...))`` funnel EVERY row into one window partition: at
100 TB that is a single task sorting 10⁸–10⁹ rows while the rest of the
cluster idles.  The exact equivalent here is the classic two-pass
distributed zip-with-index:

1. ``repartitionByRange`` on the (total) sort key — one reservoir-sample
   pass picks balanced range boundaries, then every task receives only
   its slice of the order;
2. a ≤``npart``-row driver aggregation of per-partition counts yields
   the cumulative rank OFFSET of each range partition (bounded collect —
   rows ∝ shuffle-partition count, never data);
3. ``row_number()`` over ``Window.partitionBy(partition id)`` gives the
   local rank inside each slice, fully parallel across slices, and
   ``offset + local`` is the EXACT global rank.

Because range partitioning is order-aligned (all keys in slice i sort
before all keys in slice i+1) and the caller's sort key is required to
be a TOTAL order (no ties — append a unique id column), the result is
bit-identical to the single-partition window, so entries built on this
helper can keep their ntile twins' DuckDB oracles verbatim.  The
``localCheckpoint`` between pass 1 and pass 2 pins the sampled range
boundaries so the count action and the downstream plan see the same
partition assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RANK_COL = "_rank"


def global_ranked(df: DataFrame, sort_exprs: list[Column]) -> tuple[DataFrame, int]:
    """Attach an exact 1-based global rank column (``_rank``) under the
    total order ``sort_exprs`` and return ``(frame, total_row_count)``.

    ``sort_exprs`` MUST define a total order (include a unique
    tie-breaker column): equal keys may straddle a range-partition
    boundary, and only a total order makes the slice-local row_number
    globally unambiguous.  Plan: one range exchange + one hash-on-slice
    exchange, both balanced; no single task ever holds more than one
    range slice.
    """
    spark = df.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    z = (
        df.repartitionByRange(npart, *sort_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in z.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(counts.values())
    if n == 0:
        return z.withColumn(RANK_COL, F.lit(None).cast("long")).drop("_pid"), 0
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for pid_off in sorted(offsets.items()) for x in pid_off]
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*sort_exprs)
    ranked = z.withColumn(
        RANK_COL, (F.row_number().over(w) + off).cast("long")
    ).drop("_pid")
    return ranked, n


def ntile_expr(n: int, k: int, rank_col: str = RANK_COL) -> Column:
    """The exact ``ntile(k)`` tile of a row given its exact global rank
    and the known total ``n`` — pure per-row arithmetic, evaluated in
    the scan (ntile semantics: the first ``n % k`` tiles hold
    ``n // k + 1`` rows, the rest ``n // k``)."""
    base, rem = divmod(n, k)
    cut = rem * (base + 1)
    return F.expr(
        f"IF({rank_col} <= {cut},"
        f" 1 + div({rank_col} - 1, {base + 1}),"
        f" {rem} + 1 + div({rank_col} - 1 - {cut}, {max(base, 1)}))"
    ).cast("int")
