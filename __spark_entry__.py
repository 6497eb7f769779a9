"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implemented query inventory (SURVEY.md §2): the reference's nine analysis
queries Q1-Q9 over the F1/weather ``combined`` model, the pipeline stages
P1-P3 (F1 normalization, weather normalization, combine join), and scalar
operator showcases (T6 time parsing, T10 fillna). The F1 model is derived
deterministically from the TPC-H-ish test tables — see
``engineering_school_bigdata_project_f1_weather_spark/plans/f1_model.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engineering_school_bigdata_project_f1_weather_spark.operators import (
    analytics,
    bpe,
    corpus,
    curate,
    dedup,
    events,
    graph,
    marts,
    multimodal,
    olap_deep,
    quality,
    reshape,
    search,
    similarity,
    sketch,
    streamq,
    temporal,
    text,
)

# Order matters: the driver's correctness gate checks the first 50 registry
# entries in registry order.  Rounds 1-4 rotated the window at module
# granularity; round 5 switches to an explicit per-entry priority list so
# the window lands EXACTLY on the 45 entries that have never carried a
# driver-green CORRECTNESS row (union of CORRECTNESS_r01..r04 keys vs the
# registry: all of olap_deep, graph, sketch, the round-4 streamq/similarity
# additions, events wave-3, and the never-sampled tails of text/temporal/
# multimodal/corpus/search), padded to 50 with the least-recently-witnessed
# events entries (r3-green, not r4).  Testdata regenerates each round, so
# in ADDITION to the rotating driver window the whole registry is
# re-verified at round end via `python tools/selfcheck.py --ansi --json
# SELFCHECK_r{N}.json` and committed — that artifact, not the window, is
# the complete current-data correctness record.
_MODULES = [
    marts, analytics, dedup, text, events, temporal, multimodal,
    curate, corpus, reshape, quality, search, streamq, similarity,
    sketch, graph, olap_deep, bpe,
]

# First-50 driver window for round 9 (VERDICT r8 item 4): slots 1-2 are
# the two round-9 additions (never driver-witnessed by construction:
# substring-level dedup and the bigram-LM perplexity filter); the rest
# is the least-recently-witnessed fill computed from the union of
# CORRECTNESS_r01..r08 green rows — text_keywords first (it was #51 on
# the r8 list and silently fell out of the checked window), then ALL 34
# remaining r5-vintage entries (streaming drains, the PQ/kNN similarity
# wave, deep-OLAP analytics) and the 13 oldest r6-vintage entries in
# module order.  Every entry is additionally re-verified on current
# data via tools/selfcheck.py → SELFCHECK_r09.json.
_WINDOW_R9 = [
    # round-9 additions (never driver-witnessed)
    "dedup_substring", "dedup_substring_apply",
    "dedup_substring_incremental", "quality_perplexity",
    "quality_gopher_rules", "quality_stupid_backoff", "sample_dsir",
    "text_decontaminate",
    # fell out of the 51-long r8 list (r5-vintage)
    "text_keywords",
    # r5-vintage: complete
    "stream_transitions", "stream_view_purchase_join", "stream_dau",
    "stream_enriched", "stream_dedup", "sim_ivf_pq",
    "sim_recall_report", "embedding_outliers", "sim_pq",
    "sim_pq_trained", "sim_knn_graph", "events_heavy_hitters",
    "events_dau_hll", "graph_triangles", "graph_link_predict",
    "tpch_returned_revenue", "tpch_top_supplier", "part_affinity_rules",
    "tpch_small_qty_revenue", "tpch_priority_late_orders",
    "customer_cohort_ltv", "supplier_concentration",
    "discount_elasticity", "customer_rfm", "lineitem_benford",
    "tpch_cust_distribution", "tpch_promo_share", "tpch_market_share",
    "tpch_supplier_counts", "tpch_special_revenue",
    "tpch_idle_customers", "tpch_volume_shipping", "tpch_large_orders",
    "tpch_waiting_suppliers", "dedup_prefix_join",
    # r6-vintage: the oldest remaining, module order
    "events_hourly", "events_hourly_incremental", "events_sessionize",
    "events_json", "events_anomaly", "events_funnel",
]
# Rotation-intent guard (VERDICT r8 item 1: the r8 list had 51 names and
# the driver's first-50 check silently dropped the last one).
assert len(_WINDOW_R9) == 50, f"window must be exactly 50, got {len(_WINDOW_R9)}"
assert len(set(_WINDOW_R9)) == 50, "window has duplicate entries"
_WINDOW = _WINDOW_R9


def _ordered(merged: dict) -> dict:
    """Reorder a merged registry dict: _WINDOW first, rest in module order."""
    out = {k: merged[k] for k in _WINDOW if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 wins) on /root/testdata/sf0.001."""
    return marts.q1_wins(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Cache contract: a few entries persist() a shared subframe in-plan
    (see ``engineering_school_bigdata_project_f1_weather_spark/operators/
    __init__.py``); a long-lived session invoking entries repeatedly
    should ``spark.catalog.clearCache()`` between invocations, as
    tools/selfcheck.py and bench.py both do."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column aliases."""
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE_SQL)
    return _ordered(out)
