"""Adversarial-input robustness: the driver's synthetic lake is clean
(no nulls, plain ASCII, uniform doc sizes); a real 100 TB lake is not.
These tests run the operator surface over a deliberately dirty lake —
null/empty/unicode/oversized text, null event values and props, duplicate
ids — and assert completion + basic invariants (no crashes in shingling,
windows, regex, JSON extraction, or the hashing paths)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def dirty_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("dirty_lake"))
    docs = spark.createDataFrame(
        [
            (1, "", "en", "src0", 0),  # empty text
            (2, "one", "en", "src0", 3),  # single token (< shingle k)
            (3, "a b", "de", "src1", 3),  # below shingle width
            (4, "café naïve 日本語 \U0001f600 tab\tmixed", "zh", "src1", 20),
            (5, None, "fr", "src2", None),  # NULL text
            (6, "dup dup dup dup dup dup dup dup", None, "src2", 31),  # null lang
            (7, " ".join(["tok%d" % i for i in range(5000)]), "en", "src3", 30000),
            (8, "dup dup dup dup dup dup dup dup", "en", None, 31),  # exact dup, null source
            (9, "x " * 3 + "user9@example.com +1-555-0001 10.0.0.1", "es", "src4", 40),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(f"{sf}/documents.parquet")

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, '{"k": 1}'),
            (2, "2024-01-01 00:10:00", 1, "click", None, None),  # null value/props
            (3, "2024-01-01 01:00:00", None, "purchase", 5.5, '{"k": 2}'),  # null user
            (3, "2024-01-01 01:00:00", None, "purchase", 5.5, '{"k": 2}'),  # dup id
            (4, "2024-01-02 09:00:00", 2, "view", -3.25, "not json"),  # bad json
            (5, "2024-01-02 23:59:59", 2, "view", 0.0, "{}"),
            (6, "2024-01-03 01:00:00", 2, None, 1.0, "{}"),  # null event_type
            (7, "2024-01-03 01:05:00", 2, None, 1.0, "{}"),  # consecutive null
            (8, "2024-01-03 01:10:00", 2, "view", 1.0, "{}"),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    events.write.parquet(f"{sf}/events.parquet")

    emb = spark.createDataFrame(
        [
            (1, [0.0] * 64, 0),  # zero vector (norm 0 — division guard)
            (2, [1.0] + [0.0] * 63, 1),
            (3, [0.5] * 64, 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    emb.write.parquet(f"{sf}/embeddings.parquet")
    return sf


def test_text_operators_survive_dirty_docs(spark, dirty_sf):
    from engineering_school_bigdata_project_f1_weather_spark.operators import corpus, dedup, text

    # chunking: every non-null-text doc chunked; the 5000-token doc splits
    chunks = corpus.text_chunk(spark, dirty_sf)
    assert chunks.where(F.col("doc_id") == 7).count() > 100
    # empty text yields one empty chunk row, not a crash
    assert chunks.where(F.col("doc_id") == 1).count() == 1

    # dedup paths: the two byte-identical docs (6, 8) form a dup group
    exact = dedup.dedup_exact(spark, dirty_sf)
    dup_groups = exact.where(F.col("n_docs") > 1).collect()
    assert any(r.keeper_id == 6 for r in dup_groups)
    dedup.dedup_minhash_lsh(spark, dirty_sf).collect()  # no shingle crashes

    # quality/repetition/langid: run to completion, ratios in range
    rep = corpus.text_repetition(spark, dirty_sf)
    assert rep.where(
        (F.col("top_ratio_e6") < 0) | (F.col("top_ratio_e6") > 1_000_000)
    ).count() == 0
    text.text_quality(spark, dirty_sf).collect()
    text.text_tokens(spark, dirty_sf).collect()

    # PII scrub finds the planted address row without regex errors
    pii = corpus.text_pii(spark, dirty_sf)
    assert pii.where(F.col("doc_id") == 9).collect()[0].n_pii >= 3


def test_corpus_assembly_survives_dirty_docs(spark, dirty_sf):
    from engineering_school_bigdata_project_f1_weather_spark.operators import corpus, quality

    corpus.sample_split(spark, dirty_sf).collect()
    corpus.sample_stratified(spark, dirty_sf).collect()  # null lang → default rate
    corpus.corpus_pack(spark, dirty_sf).collect()
    corpus.corpus_shuffle(spark, dirty_sf).collect()
    mix = corpus.corpus_mix(spark, dirty_sf)
    mix.collect()  # null source partitions on null key — no crash
    quality.quality_score(spark, dirty_sf).collect()

    forget = corpus.corpus_forget(spark, dirty_sf).collect()
    # null text hashes to null digest and must never join as "equal"
    assert all(r.digest is not None for r in forget)


def test_events_operators_survive_dirty_events(spark, dirty_sf):
    from engineering_school_bigdata_project_f1_weather_spark.operators import events

    hourly = events.events_hourly(spark, dirty_sf)
    assert hourly.count() > 0  # null value rows aggregate, not crash
    events.events_sessionize(spark, dirty_sf).collect()  # null user_id group
    events.events_json(spark, dirty_sf).collect()  # malformed JSON → nulls
    events.events_resample(spark, dirty_sf).collect()
    events.events_concurrency(spark, dirty_sf).collect()


def test_similarity_survives_zero_vector(spark, dirty_sf):
    """Zero-norm vectors: cosine divides by sqrt(n2a*n2b) — the zero
    vector must not produce a crash or a bogus pair (NaN/NULL sims are
    filtered by every >= threshold predicate)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup, similarity

    pairs = dedup.dedup_embedding(spark, dirty_sf, allow_quadratic=True).collect()
    assert all(
        {p.vec_a, p.vec_b} != {1} and 1 not in (p.vec_a, p.vec_b) for p in pairs
    )
    similarity.sim_lsh(spark, dirty_sf).collect()
    similarity.sim_lsh_banded(spark, dirty_sf).collect()


def test_round4_operators_survive_dirty_lake(spark, dirty_sf):
    """Round-4 operators on the dirty fixture: SCD2 groups the NULL-user
    rows without crashing, keeper selection still picks exactly one doc
    per component, and the kNN graph tolerates the zero-norm vector
    (its sims surface as 0, never NaN/NULL)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        dedup,
        similarity,
        temporal,
    )

    scd2 = temporal.events_scd2(spark, dirty_sf).collect()
    assert scd2  # runs; null user_id forms its own partition group
    # NULL event_type forms its OWN run (IS DISTINCT FROM semantics):
    # user 2's tail is view…view → NULL,NULL → view = a 2-event NULL run
    u2 = sorted(
        (r for r in scd2 if r.user_id == 2), key=lambda r: r.valid_from_us
    )
    assert [r.event_type for r in u2] == ["view", None, "view"]
    assert u2[1].n_events == 2  # consecutive NULLs collapse into one run
    by_user: dict = {}
    for r in scd2:
        by_user.setdefault(r.user_id, []).append(r)
    for runs in by_user.values():
        runs.sort(key=lambda r: r.valid_from_us)
        # intervals chain: each valid_to equals the next valid_from
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to_us == b.valid_from_us
        assert runs[-1].valid_to_us is None  # open current interval

    keep = dedup.dedup_keep_best(spark, dirty_sf).collect()
    comps: dict = {}
    for r in keep:
        comps.setdefault(r.component, []).append(r)
    for members in comps.values():
        assert sum(1 for m in members if m.keep) == 1

    g = similarity.sim_knn_graph(spark, dirty_sf).collect()
    assert g
    assert all(r.sim_e6 is not None for r in g)
    # the zero vector's edges carry sim 0 (NaN mapped to 0 in the Arrow
    # verify, matching the JVM cast) — never a NaN-poisoned rank
    zero_edges = [r for r in g if r.vec_id == 1 or r.nbr_id == 1]
    assert zero_edges and all(r.sim_e6 <= 0 for r in zero_edges)
