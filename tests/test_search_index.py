"""Incremental retrieval index (search_index_*): retry idempotency,
compaction invariance, and the token-bucket pruning contract — the
per-family tests every LSM index carries (minhash / occ-log / SemDeDup
precedents). Batch parity is the registry entry's oracle hash gate."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.functions import snapshots
from engineering_school_bigdata_project_f1_weather_spark.operators import search
from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
    load_table_spread,
)


def _serve_rows(spark, idx):
    return sorted(
        (r.doc_id, r.bm25_e6)
        for r in search.search_index_serve(spark, idx).collect()
    )


def _halves(spark, sf_dir):
    docs = load_table_spread(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    half = docs.agg(F.expr("div(max(doc_id), 2)").alias("h")).first()["h"]
    return (
        docs.where(F.col("doc_id") <= half),
        docs.where(F.col("doc_id") > half),
    )


def test_search_index_update_retry_is_noop(spark, sf_dir, tmp_path):
    """A clean retry of a fully-committed batch returns an empty frame
    and leaves serving unchanged."""
    first, second = _halves(spark, sf_dir)
    idx = str(tmp_path / "sidx")
    search.search_index_init(spark, first, idx)
    out1 = search.search_index_update(spark, second, idx)
    assert out1.count() > 0
    before = _serve_rows(spark, idx)
    out2 = search.search_index_update(spark, second, idx)
    assert out2.count() == 0
    assert _serve_rows(spark, idx) == before


def test_search_index_compact_serving_invariant(spark, sf_dir, tmp_path):
    """Compaction rewrites the accumulated per-batch files into one file
    per token-bucket partition without changing serving, and a
    post-compaction ingest still lands correctly."""
    first, second = _halves(spark, sf_dir)
    # split the second half again so the index accumulates two batches
    mid = second.agg(F.expr("div(max(doc_id) * 3, 4)").alias("m")).first()["m"]
    idx = str(tmp_path / "sidx_c")
    search.search_index_init(spark, first, idx)
    search.search_index_update(
        spark, second.where(F.col("doc_id") <= mid), idx
    )
    before = _serve_rows(spark, idx)
    search.search_index_compact(spark, idx)
    assert _serve_rows(spark, idx) == before
    base = os.path.join(idx, snapshots.snap_live(idx))
    for d in os.listdir(f"{base}/postings"):
        if d.startswith("tb="):
            files = [
                f
                for f in os.listdir(f"{base}/postings/{d}")
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, d
    # ingest after compaction
    search.search_index_update(
        spark, second.where(F.col("doc_id") > mid), idx
    )
    full_idx = str(tmp_path / "sidx_full")
    search.search_index_init(spark, first.unionByName(second), full_idx)
    assert _serve_rows(spark, idx) == _serve_rows(spark, full_idx)


def test_search_index_probe_prunes_token_buckets(spark, sf_dir, tmp_path):
    """The query-time postings probe filtered to the query terms' tb
    values must land as a PartitionFilters entry and actually read fewer
    partitions than the full table — the occ-log pruning contract,
    postings side."""
    first, second = _halves(spark, sf_dir)
    idx = str(tmp_path / "sidx_p")
    search.search_index_init(spark, first.unionByName(second), idx)
    base = os.path.join(idx, snapshots.snap_live(idx))
    tb_dirs = [
        d for d in os.listdir(f"{base}/postings") if d.startswith("tb=")
    ]
    assert len(tb_dirs) > 1
    tbs = sorted({search._tb_of_py(t) for t in search.SEARCH_QUERY})
    stored = spark.read.parquet(f"{base}/postings")
    probe = stored.where(F.col("tb").isin(tbs))
    from tests.test_plans import _formatted

    plan = _formatted(probe)
    assert "PartitionFilters" in plan
    assert "tb" in plan.split("PartitionFilters", 1)[1][:200]
    pruned_files = probe.select(F.input_file_name().alias("f")).distinct().collect()
    assert 0 < len(pruned_files) < len(tb_dirs) or len(tbs) >= len(tb_dirs)
    # the python-side bucket hash matches the engine's
    eng = {
        (r.token, r.tb)
        for r in stored.where(F.col("token").isin(search.SEARCH_QUERY))
        .select("token", "tb")
        .distinct()
        .collect()
    }
    for token, tb in eng:
        assert search._tb_of_py(token) == tb
