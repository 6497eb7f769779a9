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

# First-50 driver window for round 8 (VERDICT r7 item 6): slots 1-3 are
# the three round-8 additions (never driver-witnessed by construction:
# the incremental entity-resolution entry and the two sketch-as-
# streaming-state twins); the rest is the least-recently-witnessed
# fill — ALL 28 r4-vintage entries (the dedup tail, the text heads,
# window_suite, the tpch quantiles/cube/grouping-sets block, the join
# trio, and the two tolerance-gated analytics rows), then the 19
# oldest r5-vintage entries in module order.  Every entry is
# additionally re-verified on current data via tools/selfcheck.py →
# SELFCHECK_r08.json.
_WINDOW_R8 = [
    # round-8 additions (never driver-witnessed)
    "dedup_er_incremental", "stream_user_cms", "stream_heavy_hitters",
    "stream_user_bloom", "stream_value_hist", "stream_kmv",
    "stream_value_quantiles",
    # r4-vintage: the displaced fill + the dedup tail (complete)
    "tpch_revenue_rollup", "top_orders_per_customer",
    "join_anti_customers", "join_semi_customers", "join_outer_audit",
    "window_suite", "tpch_quantiles", "tpch_cube", "tpch_grouping_sets",
    "tpch_distinct_parts", "tpch_quantiles_approx",
    "dedup_recall_report", "dedup_cluster_stats", "dedup_exact",
    "dedup_fingerprint", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_winnow", "winnow_matches",
    "doc_pagerank", "dedup_embedding", "dedup_components",
    "dedup_keep_best", "text_tokens", "text_langid",
    "text_langid_ngram", "text_quality",
    # r5-vintage: the oldest remaining, module order
    "text_collocations", "events_ewma", "events_dau_mau",
    "events_transitions", "events_ab_test", "events_scd2",
    "events_scd2_lookup", "multimodal_dedup", "multimodal_fingerprint",
    "multimodal_segments", "corpus_card", "sample_balanced",
    "sample_quality_weighted", "text_sparse_sim", "documents_zipf",
    "text_keywords",
]
_WINDOW = _WINDOW_R8


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
