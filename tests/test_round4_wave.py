"""Round-4 third-wave operators (events_transitions, graph_link_predict,
embedding_outliers, text_sparse_sim): oracle parity at sf0.001 plus the
semantic invariants each operator's docstring promises."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod
from engineering_school_bigdata_project_f1_weather_spark.operators import (
    events,
    graph,
    search,
    similarity,
)
from tools.selfcheck import canon_rows

WAVE = [
    "events_transitions",
    "events_ab_test",
    "graph_link_predict",
    "embedding_outliers",
    "text_sparse_sim",
]


@pytest.mark.parametrize("name", WAVE)
def test_matches_oracle(name, spark, sf_dir, duck):
    sdf = entrymod.queries()[name](spark, sf_dir)
    spdf = sdf.toPandas()
    dpdf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert len(spdf) == len(dpdf) > 0
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    sh, _ = canon_rows(list(spdf.columns), list(spdf.itertuples(index=False, name=None)))
    dh, _ = canon_rows(list(dpdf.columns), list(dpdf.itertuples(index=False, name=None)))
    assert sh == dh


def test_transitions_rows_sum_to_stream_length(spark, sf_dir):
    """Σ transition counts = Σ_users (events_of_user − 1): every
    consecutive pair contributes exactly one matrix cell."""
    out = events.events_transitions(spark, sf_dir)
    total = out.agg(F.sum("n")).collect()[0][0]
    per_user = (
        events.load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg((F.count(F.lit(1)) - 1).alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    assert total == per_user
    # conditional probabilities sum to ~1e6 per from_type (floor slack
    # is < number of to-cells)
    sums = out.groupBy("from_type").agg(F.sum("p_ppm").alias("s")).collect()
    for r in sums:
        assert 1_000_000 - 25 <= r.s <= 1_000_000


def test_ab_test_chi2_matches_scipy_formula(spark, sf_dir):
    """Recompute χ² in pure Python from the returned 2×2 table — the
    in-plan double arithmetic must agree exactly; rates are exact ppm."""
    import math

    r = events.events_ab_test(spark, sf_dir).collect()[0]
    assert r.p_a_ppm == r.conv_a * 1_000_000 // r.n_a
    assert r.p_b_ppm == r.conv_b * 1_000_000 // r.n_b
    det = r.conv_a * (r.n_b - r.conv_b) - r.conv_b * (r.n_a - r.conv_a)
    c = r.conv_a + r.conv_b
    n = r.n_a + r.n_b
    if c in (0, n):
        assert r.chi2_e6 == 0
    else:
        chi2 = (
            float(n) * (float(det) * float(det))
            / (float(r.n_a) * float(r.n_b) * float(c) * float(n - c))
            * 1_000_000.0
        )
        assert r.chi2_e6 == math.floor(chi2)
    assert r.significant == (r.chi2_e6 >= events.AB_CHI2_95_E6)
    # the assignment split is user-parity — arms must be non-trivial
    assert r.n_a > 0 and r.n_b > 0
    assert 0 < r.conv_a < r.n_a  # conversion threshold keeps rates interior


def test_link_predict_excludes_existing_edges(spark, sf_dir):
    """No predicted pair may already be an edge of the support graph, and
    every Jaccard must be consistent with its count columns."""
    e = {(r.a, r.b) for r in graph._support_edges(spark, sf_dir).collect()}
    assert e  # support graph is non-trivial at every SF
    for r in graph.graph_link_predict(spark, sf_dir).collect():
        assert (r.a, r.b) not in e
        assert r.common >= 1
        assert 0 < r.jaccard_ppm <= 1_000_000


def test_embedding_outliers_are_per_label_maxima(spark, sf_dir):
    """rank-1 per label carries the label's maximum distance; every label
    present in the fixture reports exactly OUTLIER_TOP_K rows (labels have
    ≥ 5 members at every SF)."""
    out = similarity.embedding_outliers(spark, sf_dir).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r)
    for label, rows in by_label.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        dists = [r.dist2 for r in rows]
        assert dists == sorted(dists, reverse=True)


def test_sparse_sim_agrees_with_direct_cosine(spark, sf_dir):
    """Recompute one reported pair's cosine directly from its shingle
    sets and idf weights; the join must agree exactly."""
    import math

    rows = search.text_sparse_sim(spark, sf_dir).collect()
    assert rows, "fixture corpus contains near-duplicates at every SF"
    r0 = rows[0]
    docs = {
        r.doc_id: set(r.shs)
        for r in (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id").isin([r0.doc_a, r0.doc_b]))
            .select(
                "doc_id",
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, greatest(size(split(text,' '))-2,0)),"
                        " i -> concat_ws(' ', split(text,' ')[i-1],"
                        " split(text,' ')[i], split(text,' ')[i+1]))"
                    )
                ).alias("shs"),
            )
            .collect()
        )
    }
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # idf weights need global dfs — recompute for the union of shingles
    union = docs[r0.doc_a] | docs[r0.doc_b]
    all_sh = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, greatest(size(split(text,' '))-2,0)),"
                        " i -> concat_ws(' ', split(text,' ')[i-1],"
                        " split(text,' ')[i], split(text,' ')[i+1]))"
                    )
                )
            ).alias("s"),
        )
        .where(F.col("s").isin(list(union)))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    w = {
        r.s: min(n_docs * 1000 // r.df, search.SPARSE_IDF_CAP)
        for r in all_sh
        if r.df <= search.SPARSE_MAXDF
    }
    wa = {s: w[s] for s in docs[r0.doc_a] if s in w}
    wb = {s: w[s] for s in docs[r0.doc_b] if s in w}
    dot = sum(wa[s] * wb[s] for s in set(wa) & set(wb))
    n2a = sum(v * v for v in wa.values())
    n2b = sum(v * v for v in wb.values())
    assert dot == r0.dot
    assert math.floor(dot * 1_000_000.0 / math.sqrt(float(n2a) * float(n2b))) == r0.sim_e6


def test_keywords_exactly_k_per_doc(spark, sf_dir):
    import pyspark.sql.functions as F

    out = search.text_keywords(spark, sf_dir)
    per = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    bad = per.where(F.col("n") > search.KEYWORDS_PER_DOC).count()
    assert bad == 0
    # scores strictly ordered within each doc's ranks
    rows = out.where(F.col("doc_id") == out.select("doc_id").first().doc_id).collect()
    rows.sort(key=lambda r: r.rk)
    for a, b in zip(rows, rows[1:]):
        assert (a.score_e6, ) >= (b.score_e6, )


def test_ewma_recurrence_matches_python(spark, sf_dir):
    """Re-run the integer recurrence in pure Python for one event type."""
    rows = [
        r
        for r in events.events_ewma(spark, sf_dir).collect()
        if r.event_type == "click"
    ]
    rows.sort(key=lambda r: r.hour_us)
    assert rows
    s = rows[0].n_events
    assert rows[0].ewma == s
    for r in rows[1:]:
        s = (s + r.n_events) // 2
        assert r.ewma == s
