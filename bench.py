"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the `noop` sink so the full plan executes
(count() alone would let Catalyst prune projections).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engineering_school_bigdata_project_f1_weather_spark import get_spark
import __spark_entry__ as entrymod

# Headline set: reference analytics (join + agg + window + top-k) and the
# training-data-pipeline operators (LSH dedup, ANN, text, sessionize).
BENCH_QUERIES = [
    "q1_wins",
    "q2_fastestlap",
    "q4_weather",
    "q5_evopoints",
    "q8_circuit_stats",
    "q9_top10",
    "p3_combined",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_winnow",
    "sim_topk",
    "sim_lsh",
    "sim_ivf",
    "text_quality",
    "events_hourly",
    "events_sessionize",
    "events_asof_purchase",
    "window_suite",
    "tpch_shipping_priority",
    # The two most complex plans (iterative connected components; the
    # composed curation funnel) — benched so regressions like the r1
    # winnow blow-up can't hide (VERDICT r1 item 4).
    "dedup_components",
    "corpus_curate",
    # round-2 composed plans over the pair graphs
    "winnow_matches",
    "sim_clusters",
    # one representative per remaining family
    "text_chunk",
    "text_contamination",
    "text_langid_ngram",
    "dq_lineitem",
    "events_retention",
    "orders_rolling_7d",
    "events_pivot",
    "multimodal_energy",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Untimed warmup: spin up executors, codegen, and the parquet reader so
    # the first timed query reflects steady-state, not JVM startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries["q3_filter"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
