"""WordPiece tokenizer: Spark trainer vs pure-Python reference, greedy
walk parity, frozen-artifact provenance (the BPE/unigram test model)."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators import wordpiece as wp

SCALE = wp.WP_SCORE_SCALE


def ref_train(word_n: dict[str, int], n_merges: int) -> list[str]:
    """Pure-Python WordPiece trainer — likelihood-scored merges with the
    exact integer score and (score desc, freq desc, l asc, r asc) ties."""
    segs = {w: [w[0]] + [wp.WP_CONT + c for c in w[1:]] for w in word_n}
    alphabet = sorted({s for seg in segs.values() for s in seg})
    vocab = list(alphabet)
    for _ in range(n_merges):
        pf: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for w, seg in segs.items():
            n = word_n[w]
            for s in seg:
                sc[s] = sc.get(s, 0) + n
            for a, b in zip(seg, seg[1:]):
                pf[(a, b)] = pf.get((a, b), 0) + n
        if not pf:
            break
        cands = sorted(
            pf.items(),
            key=lambda kv: (
                -(kv[1] * SCALE // (sc[kv[0][0]] * sc[kv[0][1]])),
                -kv[1],
                kv[0][0],
                kv[0][1],
            ),
        )
        (left, right), freq = cands[0]
        if freq < 2:
            break
        merged = wp._wp_merged(left, right)
        vocab.append(merged)
        for w, seg in segs.items():
            out, i = [], 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == left and seg[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = out
    return vocab


def ref_greedy(word: str, vocab: list[str]) -> tuple[int, int]:
    """(n_tokens, n_unk) under greedy longest-match-first."""
    vs = set(vocab)
    maxp = wp._wp_max_piece(vocab)
    pos, tok, unk = 0, 0, 0
    while pos < len(word):
        ls = None
        for length in range(min(maxp, len(word) - pos), 0, -1):
            p = word[pos:pos + length]
            if pos > 0:
                p = wp.WP_CONT + p
            if p in vs:
                ls = length
                break
        if ls is None:
            pos += 1
            tok += 1
            unk += 1
        else:
            pos += ls
            tok += 1
    return tok, unk


def _word_counts_py(spark, sf_dir) -> dict[str, int]:
    from engineering_school_bigdata_project_f1_weather_spark.operators.bpe import word_counts

    return {r["word"]: r["n"] for r in word_counts(spark, sf_dir).collect()}


def test_train_wordpiece_matches_python_reference(spark, sf_dir):
    """The distributed trainer — likelihood argmax per round, greedy
    non-overlapping rewrite — is bit-identical to the reference."""
    got = wp.train_wordpiece(spark, sf_dir)
    want = ref_train(_word_counts_py(spark, sf_dir), wp.WP_N_MERGES)
    assert got == want
    assert any(len(p) > 1 and not p.startswith(wp.WP_CONT) for p in got)


def test_wordpiece_walk_matches_reference_per_word(spark, sf_dir):
    """The Spark greedy fold equals the reference walk on every corpus
    word plus out-of-alphabet and mixed words (UNK handling) under the
    frozen vocab."""
    v = wp.WP_FROZEN_VOCAB
    words = list(_word_counts_py(spark, sf_dir)) + ["xyzzy!", "windXw", "Z"]
    rows = (
        spark.createDataFrame([(w,) for w in words], "word string")
        .select("word", F.expr(wp._wp_walk_expr(v)).alias("wk"))
        .collect()
    )
    assert len(rows) > 20
    for r in rows:
        tok, unk = ref_greedy(r["word"], v)
        assert (r["wk"]["n_tok"], r["wk"]["n_unk"]) == (tok, unk), r["word"]


def test_wordpiece_frozen_vocab_provenance(spark):
    """WP_FROZEN_VOCAB is train_wordpiece(sf0.01) verbatim."""
    got = wp.train_wordpiece(spark, "/root/testdata/sf0.01")
    assert got == wp.WP_FROZEN_VOCAB


def test_wordpiece_apply_totality_and_compression(spark, sf_dir):
    """Apply is total (every doc gets a row; UNKs counted, never
    dropped) and the merged pieces compress: total wordpiece tokens <
    total characters of the tokenized words."""
    out = wp.text_wordpiece_apply(spark, sf_dir).collect()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.length("text") > 0)
        .count()
    )
    assert len(out) == docs
    assert all(r["n_wp_tokens"] > 0 for r in out)
    assert all(r["n_unk"] >= 0 for r in out)
    # compression: the frozen vocab's multi-char pieces fire somewhere
    total_tok = sum(r["n_wp_tokens"] for r in out)
    words_chars = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") > 0)
        .agg(F.sum(F.length("w")).alias("c"))
        .collect()[0]["c"]
    )
    assert total_tok < words_chars
