"""Triangle counting: pinned on a hand-computed fixture graph (where
the per-node counts are known), plus the exactly-once orientation
property on a clique (no /3 or /6 correction factor hides double
counting there), plus the sf-data entry against a naive Spark
recount."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators import graph


def _tri_from_edges(spark, edges):
    """Run the oriented-wedge pipeline on an explicit edge list."""
    e = spark.createDataFrame(edges, "a bigint, b bigint")
    o = graph._oriented(e)
    w1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = w1.join(w2, "u").where(F.col("v") != F.col("w"))
    closer = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tris = wedges.join(closer, ["v", "w"])
    return (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_fixture_graph_per_node_counts(spark):
    # Triangle 1-2-3, triangle 2-3-4 (sharing edge 2-3), pendant 4-5:
    # node 1 → 1 triangle, nodes 2,3 → 2 each, node 4 → 1, node 5 → 0.
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    got = {r["node"]: r["n"] for r in _tri_from_edges(spark, edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_clique_counts_each_triangle_exactly_once(spark):
    # K5: C(5,3) = 10 triangles, each node in C(4,2) = 6 of them. All
    # degrees equal, so orientation falls back to the id tie-break —
    # any double counting would show up as a multiple of these numbers.
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = {r["node"]: r["n"] for r in _tri_from_edges(spark, edges).collect()}
    assert got == {v: 6 for v in range(5)}
    total = sum(got.values())
    assert total == 30  # 10 triangles × 3 nodes


def test_sf_entry_matches_naive_recount(spark, sf_dir):
    per_part = graph.graph_triangles(spark, sf_dir)
    total_participations = per_part.agg(F.sum("n_triangles")).collect()[0][0]
    e = graph._support_edges(spark, sf_dir)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    naive = e1.join(e2, "y").join(e3, ["x", "z"]).count()
    assert total_participations == 3 * naive
