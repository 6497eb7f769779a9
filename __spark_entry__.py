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

# First-50 driver window for round 7 (VERDICT r6 item 5): with the
# cross-round driver-witnessed union at 152/152 after round 6, the
# freshness gradient is the target — slots 1-9 are the nine round-7
# additions (never witnessed by construction: the five TPC-H shapes
# Q2/Q9/Q11/Q12/Q20, the month-grain CMS merge proof, the full-outer
# stream-stream join, and the Bloom pair); next are the two r3-vintage
# entries that yielded their r6 slots (sim_clusters, sim_ivf); the
# remaining 41 slots are the least-recently-witnessed r4-vintage
# entries — the whole marts surface (q1-q9, p1-p3, t6, t10), the whole
# analytics module, and the r4 text/dedup heads that fit.  The
# r4-vintage dedup tail (components/minhash/keep_best/…) rotates into
# the r8 window; every entry is additionally re-verified on current
# data via tools/selfcheck.py → SELFCHECK_r07.json.
_WINDOW_R7 = [
    # round-7 additions (never driver-witnessed)
    "tpch_min_cost_supplier", "tpch_product_profit",
    "tpch_important_stock", "tpch_shipmode_priority",
    "tpch_promo_suppliers", "events_user_cms_monthly",
    "stream_view_purchase_full",
    "events_user_bloom_monthly", "orders_bloom_semi_join",
    "segment_overlap_hll", "events_value_hist_monthly",
    "hybrid_search_rrf", "stream_dau_hll",
    "events_kmv_monthly", "segment_jaccard_kmv",
    "text_search_bm25", "lineitem_snapshot_apply",
    "dedup_edit_distance", "sample_weighted_reservoir",
    "events_heavy_hitters_monthly", "text_bpe_apply", "sim_mmr",
    "dedup_entity_resolution", "events_attribution",
    "events_value_quantiles_monthly", "events_funnel_windowed",
    # r3-vintage (yielded their r6 slots to the round-6 additions)
    "sim_clusters", "sim_ivf",
    # r4-vintage: the full reference-parity marts surface
    "q1_wins", "q2_fastestlap", "q3_filter", "q4_weather",
    "q5_evopoints", "q6_constructor", "q7_pitstops", "q8_circuit_stats",
    "q9_top10", "p1_f1_formatted", "p2_weather_daily", "p3_combined",
    "t6_parse_time", "t10_weather_filled",
    # r4-vintage: the full analytics module
    "orders_skyline", "orders_distribution", "tpch_pricing_summary",
    "tpch_revenue_by_nation", "tpch_shipping_priority", "tpch_big_orders",
    "orders_above_avg", "orders_rolling_7d",
    # (the r4-vintage fill — text_tokens, text_langid, the dedup heads,
    # tpch_revenue_rollup, top_orders_per_customer, join_anti_customers,
    # join_semi_customers, join_outer_audit, window_suite,
    # tpch_quantiles, tpch_cube, tpch_grouping_sets, and the two
    # tolerance-gated analytics rows tpch_distinct_parts /
    # tpch_quantiles_approx — yielded their slots to the late-round-7
    # additions, which are never-driver-witnessed and can only earn a
    # row through this window; the displaced entries rotate into the r8
    # window with the dedup tail)
]


def _ordered(merged: dict) -> dict:
    """Reorder a merged registry dict: _WINDOW_R7 first, rest in module order."""
    out = {k: merged[k] for k in _WINDOW_R7 if k in merged}
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
