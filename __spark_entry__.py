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
    sketch, graph, olap_deep,
]

# First-50 driver window for round 5: 45 never-driver-witnessed entries
# (computed from CORRECTNESS_r01..r04 key union) + 5 least-recently
# witnessed fillers.  Entries not listed keep their module order after
# the window.
_WINDOW_R5 = [
    # olap_deep (16) — never driver-witnessed (selfcheck-green r4)
    "tpch_returned_revenue", "tpch_top_supplier", "part_affinity_rules",
    "tpch_small_qty_revenue", "tpch_priority_late_orders",
    "customer_cohort_ltv", "supplier_concentration", "discount_elasticity",
    "customer_rfm", "lineitem_benford", "tpch_cust_distribution",
    "tpch_promo_share", "tpch_market_share", "tpch_supplier_counts",
    "tpch_special_revenue", "tpch_idle_customers",
    # graph (2) + sketch (1)
    "graph_triangles", "graph_link_predict", "events_heavy_hitters",
    # streamq round-4 additions (4)
    "stream_transitions", "stream_dau", "stream_enriched", "stream_dedup",
    # similarity round-4 additions (6)
    "sim_ivf_pq", "sim_recall_report", "embedding_outliers",
    "sim_pq", "sim_pq_trained", "sim_knn_graph",
    # events wave-3 (5) + temporal scd2 (2)
    "events_ewma", "events_dau_mau", "events_transitions", "events_ab_test",
    "events_scd2", "events_scd2_lookup",
    # multimodal tail (3)
    "multimodal_dedup", "multimodal_fingerprint", "multimodal_segments",
    # corpus tail (3) + search tail (3) + text tail (1)
    "corpus_card", "sample_balanced", "sample_quality_weighted",
    "text_sparse_sim", "documents_zipf", "text_keywords",
    "text_collocations",
    # round-5 additions (never witnessed by construction): the hard
    # decorrelation (Q21), the aggregate-semi-join (Q18), the dual-role
    # dim join (Q7), the HLL sketch, and the stream-stream join fill the
    # last 5 window slots; tpch_forecast_revenue (trivial single-scan
    # shape) sits first AFTER the window, covered by selfcheck.
    "tpch_waiting_suppliers", "tpch_large_orders", "tpch_volume_shipping",
    "events_dau_hll", "stream_view_purchase_join",
    "tpch_forecast_revenue",
]


def _ordered(merged: dict) -> dict:
    """Reorder a merged registry dict: _WINDOW_R5 first, rest in module order."""
    out = {k: merged[k] for k in _WINDOW_R5 if k in merged}
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
