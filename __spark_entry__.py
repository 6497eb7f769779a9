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

# First-50 driver window for round 6 (VERDICT r5 item 1): slots 1-2 are
# the only two entries never driver-witnessed across r1-r5
# (dedup_prefix_join, tpch_forecast_revenue — both landed after the r5
# window was fixed); slots 3-6 are the four round-6 additions (never
# witnessed by construction); the remaining 44 slots are the
# least-recently-witnessed entries (last green in CORRECTNESS_r03 —
# sim_clusters and sim_ivf yield their slots to the r6 additions and
# keep their r3 driver rows).
# With this window green, the cross-round driver-witnessed union covers
# the ENTIRE registry. Entries not listed keep module order after the
# window; the full registry is additionally re-verified on current data
# via tools/selfcheck.py → SELFCHECK_r06.json.
_WINDOW_R6 = [
    # never driver-witnessed (r5 additions that missed the window)
    "dedup_prefix_join", "tpch_forecast_revenue",
    # round-6 additions: left-outer stream-stream join, HLL month merge,
    # Count-Min point-frequency sketch, Z-order layout maintenance
    "stream_view_purchase_outer", "events_mau_hll", "events_user_cms",
    "lineitem_zorder_layout",
    # r3-vintage (46): events waves 1-2
    "events_hourly", "events_hourly_incremental", "events_sessionize",
    "events_json", "events_anomaly", "events_funnel", "events_retention",
    "events_resample", "events_user_spend_salted", "events_concurrency",
    "events_asof_purchase", "events_value_bands", "events_multigrain",
    # multimodal head
    "multimodal_features", "multimodal_frames", "multimodal_energy",
    # corpus / curate / text prep
    "corpus_curate", "text_chunk", "text_contamination", "sample_split",
    "text_repetition", "text_pii", "corpus_pack", "corpus_shuffle",
    "sample_stratified", "corpus_mix", "corpus_forget",
    # reshape / quality / temporal
    "events_pivot", "weather_melt", "segment_overlap", "dq_lineitem",
    "events_json_variant", "quality_score", "lineitem_snapshot_diff",
    # search head
    "text_postings", "text_search", "text_hash_embed",
    # streaming wave-1
    "stream_hourly", "stream_sessions",
    # similarity wave-1 (sim_clusters and sim_ivf yield their slots to
    # the round-6 additions; both keep their r3 driver rows and the
    # per-round selfcheck — sim_ivf_trained exercises the same serving
    # plan with the trained quantizer)
    "sim_topk", "sim_lsh", "sim_lsh_banded", "sim_ivf_trained",
    "dedup_embedding_ann",
]


def _ordered(merged: dict) -> dict:
    """Reorder a merged registry dict: _WINDOW_R6 first, rest in module order."""
    out = {k: merged[k] for k in _WINDOW_R6 if k in merged}
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
