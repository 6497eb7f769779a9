"""Per-generator edge/candidate census for the batch-ER capstone
(VERDICT r8 item 2): separates "the output grew" from "a candidate
filter degraded" at each scale decade.

For each sf dir, counts per evidence generator:

- exact : hub edges (Σ group_size − 1 over md5 groups) — no candidate
  stage, the groupBy IS the generator.
- near  : LSH band-collision candidate pairs (every row
  dedup_minhash_lsh verifies) vs pairs passing the component Jaccard
  threshold (the edges the capstone consumes).
- typo  : q-gram prefix-join candidates ∪ tiny-doc rescue pairs (the
  join surface), the post-location-filter survivors (EDjoin mismatch
  filter, round 10), and verified ≤ τ pairs.
- union : distinct union of the three edge sets (the closure input),
  plus non-singleton component count and max component size via the
  same closure engine the capstone uses.

Usage: python tools/er_census.py [SF_DIR ...]
Prints one JSON line per dir; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark import get_spark
from engineering_school_bigdata_project_f1_weather_spark.operators import dedup


def _typo_surfaces(spark, sf_dir):
    """The pre-verify candidate frames of dedup_edit_distance — taken
    from the operator's OWN staged helpers (round 10: the census used
    to mirror them by hand; it now audits the real code paths).
    Returns (prefix-join candidate frame, post-location-filter frame):
    the gap between the two counts is what EDjoin's location-based
    mismatch filter buys before the banded-Levenshtein verify."""
    d = dedup._edit_docs(spark, sf_dir)
    pgram, prefix, cand = dedup._edit_surfaces(d)
    return cand, dedup._edit_location_filter(pgram, prefix, cand)


def census(spark, sf_dir: str) -> dict:
    docs = dedup._docs(spark, sf_dir)
    n_docs = docs.count()
    hashes = docs.select(F.md5("text").alias("h"), "doc_id")
    exact_edges = (
        hashes.groupBy("h")
        .agg((F.count(F.lit(1)) - 1).alias("e"))
        .agg(F.sum("e"))
        .collect()[0][0]
    )
    near = dedup.dedup_minhash_lsh(spark, sf_dir).persist()
    near_cand = near.count()
    near_edges = near.where(
        F.col("jaccard_e6") >= dedup.COMPONENT_MIN_JACCARD_E6
    ).count()
    near_e = near.where(
        F.col("jaccard_e6") >= dedup.COMPONENT_MIN_JACCARD_E6
    ).select("doc_a", "doc_b")
    typo_c, typo_loc = _typo_surfaces(spark, sf_dir)
    typo_cand = typo_c.count()
    typo_loc_cand = typo_loc.count()
    typo = dedup.dedup_edit_distance(spark, sf_dir).select("doc_a", "doc_b")
    typo_edges = typo.count()
    keeper = hashes.groupBy("h").agg(F.min("doc_id").alias("k"))
    exact_e = (
        hashes.join(keeper, "h")
        .where(F.col("doc_id") != F.col("k"))
        .select(F.col("k").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    union_e = exact_e.unionByName(near_e).unionByName(typo.select("doc_a", "doc_b")).distinct()
    union_edges = union_e.count()
    labels = dedup._er_closure(spark, union_e)
    comp = labels.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    stats = comp.agg(
        F.count(F.lit(1)).alias("n_comp"), F.max("sz").alias("max_sz")
    ).collect()[0]
    near.unpersist()
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "exact_edges": int(exact_edges or 0),
        "near_cand": near_cand,
        "near_edges": near_edges,
        "typo_cand": typo_cand,
        "typo_loc_cand": typo_loc_cand,
        "typo_edges": typo_edges,
        "union_edges": union_edges,
        "n_multi_components": int(stats["n_comp"]),
        "max_component": int(stats["max_sz"]),
    }


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.scaledata/sf0.5",
        "/root/repo/.scaledata/sf1",
    ]
    spark = get_spark("er-census")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(census(spark, d)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
