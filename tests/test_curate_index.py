"""Continuous-curation index (round 12, VERDICT r11 item 1): the capstone
composing the minhash pair log, the SemDeDup index, the frozen classifier,
and the split/shard/pack distribution layer into one resumable incremental
pipeline.  Batch parity vs the oracle is the registry hash gate
(curate_incremental); these tests pin the composition contracts the hash
can't see: retry idempotency at every crash point, batch-composition
invariance, and ledger internal consistency."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators import (
    curate_index,
    dedup,
    similarity,
)
from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
    load_table_spread,
)


def _split(spark, sf_dir):
    docs = load_table_spread(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    vecs = load_table_spread(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    half = docs.agg(F.expr("div(max(doc_id), 2)").alias("h")).first()["h"]
    return docs, vecs, half


def _ledger(spark, idx):
    return sorted(
        tuple(r) for r in curate_index.curate_resolve(spark, idx).collect()
    )


def test_curate_index_retry_is_noop(spark, sf_dir, tmp_path):
    """A fully-committed batch re-submitted verbatim returns an empty
    ledger delta and leaves the serving view bit-unchanged — the
    orchestrator-retry contract every index family carries, here across
    the whole composition."""
    docs, vecs, half = _split(spark, sf_dir)
    idx = str(tmp_path / "cidx")
    curate_index.curate_index_init(
        spark,
        docs.where(F.col("doc_id") <= half),
        vecs.where(F.col("vec_id") <= half),
        idx,
    )
    b_docs = docs.where(F.col("doc_id") > half)
    b_vecs = vecs.where(F.col("vec_id") > half)
    assert curate_index.curate_index_update(spark, b_docs, b_vecs, idx).count() > 0
    before = _ledger(spark, idx)
    assert curate_index.curate_index_update(spark, b_docs, b_vecs, idx).count() == 0
    assert _ledger(spark, idx) == before


def test_curate_index_retry_after_subindex_commit(spark, sf_dir, tmp_path):
    """The nested-commit crash window: the sub-indexes committed the
    batch but the top-level snapshot did not (each sub-index self-commits
    on its own CURRENT, so this interleaving is reachable).  The retry
    must reconverge to exactly the clean-path ledger — the pair delta is
    derived from committed signature state, not the sub-update's return
    value, which is empty on this retry."""
    docs, vecs, half = _split(spark, sf_dir)
    b_docs = docs.where(F.col("doc_id") > half)
    b_vecs = vecs.where(F.col("vec_id") > half)

    idx_clean = str(tmp_path / "clean")
    curate_index.curate_index_init(
        spark,
        docs.where(F.col("doc_id") <= half),
        vecs.where(F.col("vec_id") <= half),
        idx_clean,
    )
    curate_index.curate_index_update(spark, b_docs, b_vecs, idx_clean)

    idx_crash = str(tmp_path / "crash")
    curate_index.curate_index_init(
        spark,
        docs.where(F.col("doc_id") <= half),
        vecs.where(F.col("vec_id") <= half),
        idx_crash,
    )
    # simulate the crash: sub-indexes ingest the batch, top level doesn't
    similarity.semdedup_index_update(spark, b_vecs, f"{idx_crash}/sem")
    dedup.minhash_index_update(spark, b_docs, f"{idx_crash}/mh")
    # the retry sees a non-empty batch (top roster lacks it) but empty
    # sub-update returns — it must still log every pair and score row
    out = curate_index.curate_index_update(spark, b_docs, b_vecs, idx_crash)
    assert out.count() == b_docs.count()
    assert _ledger(spark, idx_crash) == _ledger(spark, idx_clean)


def test_curate_index_batch_composition(spark, sf_dir, tmp_path):
    """Ingesting the second half as ONE batch or as TWO batches yields
    the identical ledger — per-batch work composes without order or
    granularity mattering (under the same frozen init-time models)."""
    docs, vecs, half = _split(spark, sf_dir)
    q3 = docs.agg(
        F.expr("div(3 * max(doc_id), 4)").alias("q")
    ).first()["q"]

    idx_one = str(tmp_path / "one")
    curate_index.curate_index_init(
        spark,
        docs.where(F.col("doc_id") <= half),
        vecs.where(F.col("vec_id") <= half),
        idx_one,
    )
    curate_index.curate_index_update(
        spark,
        docs.where(F.col("doc_id") > half),
        vecs.where(F.col("vec_id") > half),
        idx_one,
    )

    idx_two = str(tmp_path / "two")
    curate_index.curate_index_init(
        spark,
        docs.where(F.col("doc_id") <= half),
        vecs.where(F.col("vec_id") <= half),
        idx_two,
    )
    curate_index.curate_index_update(
        spark,
        docs.where((F.col("doc_id") > half) & (F.col("doc_id") <= q3)),
        vecs.where((F.col("vec_id") > half) & (F.col("vec_id") <= q3)),
        idx_two,
    )
    curate_index.curate_index_update(
        spark,
        docs.where(F.col("doc_id") > q3),
        vecs.where(F.col("vec_id") > q3),
        idx_two,
    )
    assert _ledger(spark, idx_one) == _ledger(spark, idx_two)


def test_curate_index_compact_preserves_serving(spark, sf_dir, tmp_path):
    """curate_index_compact: fewer data files, identical ledger, and
    ingest still works afterwards — the LSM compaction contract every
    append-only index family carries."""
    import glob
    import os

    from engineering_school_bigdata_project_f1_weather_spark.functions import (
        snapshots,
    )

    docs, vecs, half = _split(spark, sf_dir)
    q3 = docs.agg(F.expr("div(3 * max(doc_id), 4)").alias("q")).first()["q"]
    idx = str(tmp_path / "cidx_compact")
    curate_index.curate_index_init(
        spark,
        docs.where(F.col("doc_id") <= half),
        vecs.where(F.col("vec_id") <= half),
        idx,
    )
    curate_index.curate_index_update(
        spark,
        docs.where((F.col("doc_id") > half) & (F.col("doc_id") <= q3)),
        vecs.where((F.col("vec_id") > half) & (F.col("vec_id") <= q3)),
        idx,
    )

    def n_files():
        live = snapshots.snap_live(idx)
        return len(
            glob.glob(os.path.join(idx, live, "*", "part-*"))
        )

    before_files = n_files()
    before = _ledger(spark, idx)
    curate_index.curate_index_compact(spark, idx)
    assert n_files() < before_files
    assert _ledger(spark, idx) == before  # serving identical
    # post-compaction ingest still composes
    curate_index.curate_index_update(
        spark,
        docs.where(F.col("doc_id") > q3),
        vecs.where(F.col("vec_id") > q3),
        idx,
    )
    led = {r[0] for r in _ledger(spark, idx)}
    assert led == {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_curate_ledger_internal_consistency(spark, sf_dir):
    """kept ⇔ conjunction of the four gates; seq_id present iff kept;
    packed sequences respect the budget arithmetic (seq_id monotone
    non-decreasing in doc_id within a language)."""
    led = curate_index.curate_incremental(spark, sf_dir).collect()
    assert len(led) > 0
    n_kept = 0
    by_lang: dict[str, list] = {}
    for r in led:
        assert r.kept == (
            r.qc_keep and r.exact_keep and r.near_keep and r.sem_keep
        )
        assert (r.seq_id is not None) == r.kept
        if r.kept:
            n_kept += 1
            by_lang.setdefault(r.lang, []).append((r.doc_id, r.seq_id))
        assert r.split in ("train", "val", "test")
        assert 0 <= r.shard < 8
    assert 0 < n_kept < len(led)  # the funnel actually gates
    for rows in by_lang.values():
        rows.sort()
        seqs = [s for _, s in rows]
        assert seqs == sorted(seqs)  # packing is a running fill
