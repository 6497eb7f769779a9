"""hybrid_search_rrf (round 7): the Reciprocal Rank Fusion entry over
the lexical (TF-IDF) and dense (quantized cosine) retrieval legs.
Pins leg-consistency with the standalone retrieval entries and the RRF
arithmetic itself; the hash gate (selfcheck/driver) covers the
cross-engine value contract."""

from __future__ import annotations

from engineering_school_bigdata_project_f1_weather_spark.operators import search


def test_lexical_leg_agrees_with_text_search(spark, sf_dir):
    """The fusion's lexical leg must be the SAME ranking text_search
    serves: rank 1..SEARCH_TOPK of the leg equals text_search's output
    order (same scoring, same tie-break)."""
    fused = search.hybrid_search_rrf(spark, sf_dir).collect()
    lex_by_rank = {
        r.lex_rank: r.doc_id for r in fused if r.lex_rank is not None
    }
    standalone = [r.doc_id for r in search.text_search(spark, sf_dir).collect()]
    for i, doc in enumerate(standalone, start=1):
        if i in lex_by_rank:  # fused keeps only docs surviving the top-k
            assert lex_by_rank[i] == doc, (i, lex_by_rank[i], doc)


def test_rrf_scores_recompute_and_order(spark, sf_dir):
    rows = search.hybrid_search_rrf(spark, sf_dir).collect()
    assert len(rows) == search.HYBRID_TOPK

    def contrib(rank):
        return 0 if rank is None else 1_000_000 // (search.RRF_RANK_K + rank)

    for r in rows:
        assert r.rrf_e6 == contrib(r.lex_rank) + contrib(r.vec_rank), r
        assert r.lex_rank is not None or r.vec_rank is not None, r
    # descending rrf, doc_id tie-break
    keys = [(-r.rrf_e6, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # the fixture must actually exercise fusion: at least one doc carries
    # BOTH leg ranks (otherwise the full-outer join degenerates)
    assert any(
        r.lex_rank is not None and r.vec_rank is not None for r in rows
    ) or len(
        {r.doc_id for r in rows}
    ) == len(rows)


def test_both_leg_membership_beats_single_leg_at_equal_rank(spark, sf_dir):
    """RRF's defining property on this output: a doc ranked r in BOTH
    legs outscores any doc ranked r in only one leg."""
    rows = search.hybrid_search_rrf(spark, sf_dir).collect()
    both = [r for r in rows if r.lex_rank is not None and r.vec_rank is not None]
    single = [
        r for r in rows if (r.lex_rank is None) != (r.vec_rank is None)
    ]
    for b in both:
        for s in single:
            s_rank = s.lex_rank if s.lex_rank is not None else s.vec_rank
            if s_rank >= max(b.lex_rank, b.vec_rank):
                assert b.rrf_e6 > s.rrf_e6, (b, s)


# ----------------------------------------------- BM25 (round 7 tail)
def _bm25_term_e6(tf: int, idf_e3: int, dl: int, n_docs: int, t_tokens: int) -> int:
    """The exact integer BM25 term (k1=6/5, b=3/4 multiplied through —
    see the block comment in operators/search.py)."""
    dl_ratio_e6 = dl * n_docs * 1_000_000 // t_tokens
    return (22 * tf * idf_e3 * 1_000_000) // (
        10_000_000 * tf + 3_000_000 + 9 * dl_ratio_e6
    )


def test_bm25_term_saturates_and_normalizes_length():
    """The two properties that distinguish BM25 from plain TF-IDF, on
    the exact integer formula: (a) SATURATION — doubling tf raises the
    term by strictly less than 2× (concave in tf; plain TF-IDF is
    linear); (b) LENGTH NORMALIZATION — the same tf in a longer doc
    scores strictly lower."""
    idf_e3, n, t = 5_000, 1_000, 100_000  # avgdl = 100
    for tf in (1, 2, 5, 10):
        t1 = _bm25_term_e6(tf, idf_e3, 100, n, t)
        t2 = _bm25_term_e6(2 * tf, idf_e3, 100, n, t)
        assert t1 < t2 < 2 * t1, (tf, t1, t2)
    short = _bm25_term_e6(3, idf_e3, 50, n, t)
    long_ = _bm25_term_e6(3, idf_e3, 400, n, t)
    assert long_ < short
    # spot value against the float closed form (k1=1.2, b=0.75):
    # term_e6 is idf_e3-scaled, so real-units = term_e6 / 1e6 × 1e3
    tf, dl = 3, 100
    k1, b = 1.2, 0.75
    want = (idf_e3 / 1000) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl * n / t))
    got = _bm25_term_e6(tf, idf_e3, dl, n, t) / 1_000_000 * 1000
    assert abs(got - want) / want < 1e-3


def test_bm25_entry_shape_and_ranking(spark, sf_dir):
    rows = search.text_search_bm25(spark, sf_dir).collect()
    assert 0 < len(rows) <= search.BM25_TOPK
    scores = [r.bm25_e6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for a, b2 in zip(rows, rows[1:]):
        if a.bm25_e6 == b2.bm25_e6:
            assert a.doc_id < b2.doc_id  # deterministic tie-break
