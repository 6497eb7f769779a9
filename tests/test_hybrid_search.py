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
