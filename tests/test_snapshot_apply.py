"""lineitem_snapshot_apply (round 7 tail): the CDC MERGE-apply entry.

The oracle hash gate proves apply(old, diff(old, cur)) = cur at the
projection level; these tests pin the pieces the gate can't see — the
change stream's op census must equal lineitem_snapshot_diff's published
census (the two entries describe the SAME reconciliation), and the
round-trip law holds at the row level locally too.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators import quality
from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
    load_table,
)


def test_cdc_stream_census_matches_diff_entry(spark, sf_dir):
    """insert/delete/update counts of the apply entry's change stream
    equal the added/removed/changed census the diff entry publishes
    (diff names the ops from the NEW snapshot's perspective)."""
    census = {
        r.op: r.n_rows
        for r in quality.lineitem_snapshot_diff(spark, sf_dir).collect()
    }
    cur = load_table(spark, sf_dir, "lineitem")
    _, cdc = quality._li_cdc_stream(cur)
    ops = {
        r.op: r.n
        for r in cdc.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert ops.get("insert", 0) == census.get("added", 0)
    assert ops.get("delete", 0) == census.get("removed", 0)
    assert ops.get("update", 0) == census.get("changed", 0)
    # all four op classes genuinely occur in the derived fixture
    assert min(ops.get(k, 0) for k in ("insert", "delete", "update")) > 0


def test_apply_round_trip_row_level(spark, sf_dir):
    """applied = cur, as row multisets (the local form of the oracle
    gate), and the delete tombstones really removed the phantom keys."""
    applied = quality.lineitem_snapshot_apply(spark, sf_dir)
    want = quality._li_proj(load_table(spark, sf_dir, "lineitem"))
    got_rows = sorted(map(tuple, applied.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    # phantom old-only rows carry l_linenumber >= 100 at this fixture
    # scale; none may survive the apply beyond those genuinely in cur
    cur_keys = {
        tuple(r) for r in want.select(*quality.ROW_KEY).collect()
    }
    app_keys = {
        tuple(r) for r in applied.select(*quality.ROW_KEY).collect()
    }
    assert app_keys == cur_keys
