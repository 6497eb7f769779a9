"""Unigram-LM tokenizer (round 12): trainer parity against a pure-Python
reference (the BPE precedent — iterative EM is not one SQL statement, so
the training loop is pinned here; the frozen-artifact APPLY side is the
hash-gated registry entry text_unigram_apply)."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.functions.intlog import (
    ilog2_q16,
)
from engineering_school_bigdata_project_f1_weather_spark.operators import unigram

MAXP = unigram.UNI_MAX_PIECE
UNK = unigram.UNI_UNK_COST_Q16
NP = unigram._NP_BASE


# ------------------------------------------------ pure-Python reference
def ref_viterbi(word: str, vocab: dict[str, int]):
    """Forward DP + smallest-L backward walk — the module's exact rules."""
    n = len(word)
    acc = [0] + [None] * n
    for j in range(1, n + 1):
        cands = []
        for L in range(1, min(MAXP, j) + 1):
            piece = word[j - L : j]
            c = vocab.get(piece)
            if c is None:
                if L != 1:
                    continue
                c = UNK
            cands.append(acc[j - L] + c * NP + 1)
        acc[j] = min(cands)
    # backward: smallest satisfying L
    pos, pieces = n, []
    while pos > 0:
        for L in range(1, min(MAXP, pos) + 1):
            piece = word[pos - L : pos]
            c = vocab.get(piece)
            if c is None:
                if L != 1:
                    continue
                c = UNK
            if acc[pos - L] + c * NP + 1 == acc[pos]:
                pieces.insert(0, piece)
                pos -= L
                break
    return acc[n], pieces


def ref_costs(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    lt = ilog2_q16(total)
    return {p: lt - ilog2_q16(c) for p, c in counts.items()}


def ref_train(word_n: dict[str, int], em_iters: int) -> dict[str, int]:
    # seed: substring occurrence counts weighted by word count
    seed: dict[str, int] = {}
    for w, n in word_n.items():
        for p in range(len(w)):
            for L in range(1, min(MAXP, len(w) - p) + 1):
                piece = w[p : p + L]
                seed[piece] = seed.get(piece, 0) + n
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    multi = {p: c for p, c in seed.items() if len(p) > 1 and c >= 2}
    top = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[
        : unigram.UNI_SEED_MULTI
    ]
    counts = {**chars, **dict(top)}
    vocab = ref_costs(counts)
    for _ in range(em_iters):
        usage: dict[str, int] = {}
        for w, n in word_n.items():
            _, pieces = ref_viterbi(w, vocab)
            for p in pieces:
                usage[p] = usage.get(p, 0) + n
        counts = {
            p: (max(usage.get(p, 0), 1) if len(p) == 1 else usage.get(p, 0))
            for p in vocab
        }
        counts = {p: c for p, c in counts.items() if len(p) == 1 or c > 0}
        vocab = ref_costs(counts)
    return vocab


def _word_counts_py(spark, sf_dir) -> dict[str, int]:
    from engineering_school_bigdata_project_f1_weather_spark.operators.bpe import (
        word_counts,
    )

    return {r["word"]: r["n"] for r in word_counts(spark, sf_dir).collect()}


def test_train_unigram_matches_python_reference(spark, sf_dir):
    """The full trainer — seeding, 3 EM rounds of Viterbi counts, exact
    Q16 cost refits — is bit-identical to the pure-Python reference."""
    got = unigram.train_unigram(spark, sf_dir)
    want = ref_train(_word_counts_py(spark, sf_dir), unigram.UNI_EM_ITERS)
    assert got == want


def test_viterbi_fold_matches_reference_per_word(spark, sf_dir):
    """The Spark forward fold's combined value and the backward walk's
    piece sequence equal the reference on every corpus word under the
    frozen vocab — including words with characters outside it (UNK)."""
    v = unigram.UNI_FROZEN_VOCAB
    rows = (
        spark.createDataFrame(
            [(w,) for w in list(_word_counts_py(spark, sf_dir)) + ["xyzzy!"]],
            "word string",
        )
        .select(
            "word",
            F.expr(unigram._viterbi_combined_expr(v)).alias("cmb"),
            F.expr(unigram._viterbi_pieces_expr(v)).alias("ps"),
        )
        .collect()
    )
    assert len(rows) > 20  # the synthetic corpus vocabulary is small
    for r in rows:
        want_cmb, want_ps = ref_viterbi(r["word"], v)
        assert r["cmb"] == want_cmb, r["word"]
        assert list(r["ps"]) == want_ps, r["word"]
        # the segmentation really is the word, and the encoding holds
        assert "".join(r["ps"]) == r["word"]
        assert r["cmb"] % NP == len(r["ps"])


def test_unigram_beats_chars_and_respects_budget(spark, sf_dir):
    """Quality floor: under the trained vocab the corpus tokenizes into
    strictly fewer pieces than characters (the multi-char pieces are
    actually used), and per-word piece counts respect the ceil(len/MAXP)
    lower bound."""
    out = unigram.text_unigram_apply(spark, sf_dir).collect()
    assert len(out) > 0
    docs = {
        r["doc_id"]: r
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    total_pieces = sum(r["n_unigram_tokens"] for r in out)
    total_chars = sum(
        len(docs[r["doc_id"]]["text"].replace(" ", "")) for r in out
    )
    assert 0 < total_pieces < total_chars
