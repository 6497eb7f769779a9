"""Unigram-LM (SentencePiece-style) tokenizer — training and application,
the second tokenizer family a training-data pipeline ships (round 12,
VERDICT r11 item 4; :mod:`bpe` is the merge-based first).

Kudo 2018's unigram LM scores a segmentation by the sum of per-piece
log-probs and trains by EM over a seeded candidate vocabulary.  The
engine realization keeps every number an exact int64 so the trainer is
reproducible across engines and retries, and the frozen-artifact apply
entry is DuckDB-hash-checkable:

- piece costs are Q16 negative log2 probs from :mod:`functions.intlog`'s
  exact shift-and-square kernel (the NB-classifier precedent);
- a segmentation's objective is ONE encoded long,
  ``combined = total_cost_q16 * 1024 + n_pieces`` (words are far
  shorter than 1024 pieces), so ``min(combined)`` IS the deterministic
  lexicographic (cost, piece-count) tie-break in both engines;
- Viterbi is a left-to-right fold over character positions carrying the
  DP array — ``F.aggregate`` in Spark, a recursive CTE carrying a LIST
  in DuckDB — with candidate pieces bounded by UNI_MAX_PIECE and the
  single-char UNK fallback keeping the fold total for ANY text;
- EM (hard-EM / Viterbi counts, the deterministic variant): E-step
  re-segments the DISTINCT-WORD frame and counts piece usage weighted
  by word frequency, M-step recomputes costs from the counts; unused
  multi-char pieces drop out, single chars are floored at count 1 for
  coverage.

Distributed structure (what matters at 100 TB): ONE corpus pass builds
the word-frequency table; seeding, every EM round, and application all
run on vocab-sized frames (distinct words / pieces), never the corpus —
the BPE trainer's exact cost model.  Per EM round the driver holds only
the piece-count table (bounded by the UNI_SEED_MULTI cap + alphabet,
i.e. model-sized — the kmeans/BPE bounded-collect precedent).

Like BPE: the iterative trainer is pytest-parity-pinned against a pure-
Python reference (tests/test_unigram.py) rather than oracle_sql-checked;
the APPLY side for the FROZEN artifact is a full hash-gated registry
entry (``text_unigram_apply``) whose DuckDB twin runs the identical DP.
Training is benched as ``text_unigram_train`` in bench.py's EXTRA_BENCH.

Reference parity note: the reference pipeline has no tokenizer — this is
extension surface for the training-data mandate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.intlog import ilog2_q16
from ..sources.tables import load_table_spread
from .bpe import word_counts

UNI_MAX_PIECE = 4  # max piece length considered (seed and DP window)
UNI_SEED_MULTI = 64  # multi-char seed pieces kept (freq desc, piece asc)
UNI_EM_ITERS = 3
UNI_UNK_COST_Q16 = 40 << 16  # fixed per-char fallback: prob 2^-40
_NP_BASE = 1024  # combined = cost_q16 * _NP_BASE + n_pieces


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _spark_map_sql(vocab: dict[str, int]) -> str:
    """Spark `map('p', cost, ...)` literal for the piece-cost table."""
    return "map(" + ", ".join(
        f"{_sql_quote(p)}, {c}L" for p, c in sorted(vocab.items())
    ) + ")"


def _duck_map_sql(vocab: dict[str, int]) -> str:
    """DuckDB `map([...], [...])` literal for the piece-cost table."""
    ks = ", ".join(_sql_quote(p) for p in sorted(vocab))
    vs = ", ".join(f"CAST({vocab[p]} AS BIGINT)" for p in sorted(vocab))
    return f"map([{ks}], [{vs}])"


def _viterbi_acc_expr(vocab: dict[str, int], word_col: str = "word") -> str:
    """Spark SQL expression: the forward-DP array over ``word_col`` —
    acc[p] (1-based) is the best ``combined`` for the length-(p-1)
    prefix.  Candidate at position j with piece length L reads
    acc[j-L+1] and the piece cost from the map literal; L=1 falls back
    to the UNK constant so the fold is total."""
    m = _spark_map_sql(vocab)
    return f"""aggregate(
  sequence(1L, length({word_col})),
  array(0L),
  (acc, j) -> concat(acc, array(
    array_min(filter(
      transform(sequence(1L, least({UNI_MAX_PIECE}L, j)),
        L -> element_at(acc, cast(j - L + 1 as int))
             + if(L = 1,
                  coalesce(element_at({m},
                      substring({word_col}, cast(j - L + 1 as int), 1)),
                      {UNI_UNK_COST_Q16}L),
                  element_at({m},
                      substring({word_col}, cast(j - L + 1 as int),
                                cast(L as int)))) * {_NP_BASE} + 1),
      x -> x is not null)))))"""


def _viterbi_combined_expr(vocab: dict[str, int], word_col: str = "word") -> str:
    return (
        f"element_at({_viterbi_acc_expr(vocab, word_col)}, "
        f"cast(length({word_col}) + 1 as int))"
    )


def _viterbi_pieces_expr(vocab: dict[str, int], word_col: str = "word") -> str:
    """Spark SQL expression: the Viterbi segmentation itself (array of
    piece strings) — a backward walk over the forward DP array.  At
    position pos the chosen piece length is the SMALLEST L whose
    candidate equals acc[pos+1] (a deterministic tie-break consistent
    with the forward min, since any satisfying L extends an optimal
    prefix).  Used by the E-step only; the apply entry needs just the
    combined value."""
    m = _spark_map_sql(vocab)
    cost_l = (
        f"if(L = 1, coalesce(element_at({m}, "
        f"substring({word_col}, cast(st.pos - L + 1 as int), 1)), "
        f"{UNI_UNK_COST_Q16}L), "
        f"element_at({m}, substring({word_col}, "
        f"cast(st.pos - L + 1 as int), cast(L as int))))"
    )
    # Lstar: the chosen backstep length; bound ONCE per step via the
    # single-element transform (Spark SQL has no let-binding — mapping
    # over array(Lstar) names the value L inside the struct builder).
    lstar = f"""element_at(
          filter(sequence(1L, least({UNI_MAX_PIECE}L, st.pos)),
            L -> element_at(st.acc, cast(st.pos - L + 1 as int))
                 + {cost_l} * {_NP_BASE} + 1
                 = element_at(st.acc, cast(st.pos + 1 as int))), 1)"""
    return f"""aggregate(
  sequence(1L, length({word_col})),
  named_struct('pos', cast(length({word_col}) as bigint),
               'ps', cast(array() as array<string>),
               'acc', {_viterbi_acc_expr(vocab, word_col)}),
  (st, _i) -> if(st.pos <= 0, st,
    element_at(transform(array({lstar}), L -> named_struct(
      'pos', st.pos - L,
      'ps', concat(array(substring({word_col},
                cast(st.pos - L + 1 as int), cast(L as int))), st.ps),
      'acc', st.acc)), 1)),
  st -> st.ps)"""


def _costs_from_counts(counts: dict[str, int]) -> dict[str, int]:
    """M-step: Q16 cost = log2(total) - log2(count), exact kernel."""
    total = sum(counts.values())
    lt = ilog2_q16(total)
    return {p: lt - ilog2_q16(c) for p, c in counts.items()}


def seed_counts(spark: SparkSession, words: DataFrame) -> dict[str, int]:
    """Candidate vocabulary from the word-frequency table: every
    substring of length 1..UNI_MAX_PIECE, occurrence-weighted by word
    count.  All single characters are kept (coverage guarantee);
    multi-char pieces keep the top UNI_SEED_MULTI by (count desc,
    piece asc) with count >= 2.  The explode runs on the vocab frame;
    the returned dict is model-sized (alphabet + cap)."""
    subs = (
        words.select(
            "n",
            F.explode(
                F.expr(f"""
        flatten(transform(sequence(1, length(word)),
          p -> transform(sequence(1, least({UNI_MAX_PIECE},
                                           length(word) - p + 1)),
            L -> substring(word, cast(p as int), cast(L as int)))))""")
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("c"))
    )
    chars = {
        r["piece"]: int(r["c"])
        for r in subs.where(F.length("piece") == 1).collect()
    }  # bounded: the alphabet
    multi = {
        r["piece"]: int(r["c"])
        for r in subs.where((F.length("piece") > 1) & (F.col("c") >= 2))
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(UNI_SEED_MULTI)
        .collect()
    }  # bounded: the cap
    return {**chars, **multi}


def train_unigram(
    spark: SparkSession, sf_dir: str, em_iters: int = UNI_EM_ITERS
) -> dict[str, int]:
    """Learn the unigram piece-cost table from the corpus.  Returns
    {piece: cost_q16} — the frozen tokenizer artifact."""
    return train_unigram_from_words(
        spark, word_counts(spark, sf_dir), em_iters
    )


def train_unigram_from_words(
    spark: SparkSession, words: DataFrame, em_iters: int = UNI_EM_ITERS
) -> dict[str, int]:
    words = words.localCheckpoint()
    counts = seed_counts(spark, words)
    vocab = _costs_from_counts(counts)
    for _ in range(em_iters):
        usage_rows = (
            words.select(
                "n", F.explode(F.expr(_viterbi_pieces_expr(vocab))).alias("piece")
            )
            .groupBy("piece")
            .agg(F.sum("n").cast("long").alias("c"))
            .collect()  # bounded: <= |vocab| rows (the model)
        )
        usage = {r["piece"]: int(r["c"]) for r in usage_rows}
        counts = {
            p: usage.get(p, 1 if len(p) == 1 else 0) for p in vocab
        }
        counts = {
            p: max(c, 1) if len(p) == 1 else c
            for p, c in counts.items()
            if len(p) == 1 or c > 0
        }
        vocab = _costs_from_counts(counts)
    return vocab


# ------------------------------------ frozen-artifact apply (round 12)
# train_unigram(sf0.01) hard-coded, the BPE_FROZEN_MERGES provenance:
# apply is total for ANY table (single-char UNK fallback), so testdata
# drift cannot break the entry.  Regenerate with
#   python -c "from engineering_school_bigdata_project_f1_weather_spark.operators import unigram, ...; print(unigram.train_unigram(spark, '/root/testdata/sf0.01'))"
UNI_FROZEN_VOCAB: dict[str, int] = {
    'a': 271671,
    'al': 355539,
    'at': 421543,
    'b': 357688,
    'batc': 418570,
    'c': 421127,
    'colu': 418874,
    'cust': 418874,
    'd': 317393,
    'e': 238818,
    'er': 354509,
    'f': 357529,
    'g': 270758,
    'h': 358059,
    'hash': 417567,
    'i': 356372,
    'in': 357054,
    'j': 1065535,
    'join': 415884,
    'k': 358113,
    'l': 268193,
    'm': 356007,
    'mer': 420507,
    'mn': 418874,
    'n': 1065535,
    'o': 1065535,
    'omer': 418874,
    'or': 318648,
    'ow': 356634,
    'p': 421960,
    'par': 359076,
    'q': 425476,
    'r': 359022,
    'ro': 424719,
    'row': 417967,
    's': 291360,
    'scan': 418671,
    'st': 359940,
    't': 271585,
    'ta': 421543,
    'u': 421960,
    'ue': 358540,
    'v': 356372,
    'w': 423862,
    'y': 358593,
}


def text_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: tokenize the corpus with the frozen unigram
    piece table.  Per doc: Viterbi piece count, total Q16 cost (the
    corpus-level LM objective a curation pipeline monitors), and the
    chars-per-token compression signal.  The DP runs once per DISTINCT
    word (vocab frame — the trainer's cost model) and joins back to
    the exploded doc words; the join keys are words, so the plan is
    two bounded shuffles regardless of corpus size."""
    d = load_table_spread(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").cast("long").alias("n_chars")
    )
    dw = d.select(
        "doc_id", "n_chars",
        F.explode(F.split(F.col("text"), " ")).alias("word"),
    ).where(F.length("word") > 0)
    wv = (
        dw.select("word")
        .distinct()
        .select(
            "word",
            F.expr(_viterbi_combined_expr(UNI_FROZEN_VOCAB)).alias("cmb"),
        )
        .select(
            "word",
            F.expr(f"div(cmb, {_NP_BASE})").alias("wcost"),
            (F.col("cmb") % _NP_BASE).cast("long").alias("wpieces"),
        )
    )
    return (
        dw.join(wv, "word")
        .groupBy("doc_id", "n_chars")
        .agg(
            F.sum("wpieces").cast("long").alias("n_unigram_tokens"),
            F.sum("wcost").cast("long").alias("cost_q16"),
        )
        .select(
            "doc_id",
            "n_unigram_tokens",
            "cost_q16",
            F.expr(
                "if(n_unigram_tokens = 0, 0L,"
                " div(n_chars * 1000000, n_unigram_tokens))"
            ).alias("chars_per_token_e6"),
        )
    )


def _unigram_apply_oracle_sql() -> str:
    """The identical DP as a recursive CTE carrying the accumulator
    list (one row per (word, position); the recursion is ITERATION, not
    path enumeration — min-folded per step, so rows stay linear in word
    length)."""
    m = _duck_map_sql(UNI_FROZEN_VOCAB)
    cand = f"""acc[CAST(j + 1 - L + 1 AS INT)]
                    + CASE WHEN L = 1 THEN
                        COALESCE(map_extract({m}, substring(word,
                            CAST(j + 1 - L + 1 AS INT), CAST(L AS INT)))[1],
                            CAST({UNI_UNK_COST_Q16} AS BIGINT))
                      ELSE map_extract({m}, substring(word,
                            CAST(j + 1 - L + 1 AS INT), CAST(L AS INT)))[1]
                      END * {_NP_BASE} + 1"""
    return f"""
WITH RECURSIVE dw AS (
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           unnest(string_split(text, ' ')) AS word
    FROM documents
),
dwf AS (SELECT * FROM dw WHERE length(word) > 0),
wn AS (
    SELECT DISTINCT word FROM dwf
),
wl AS (SELECT word, CAST(length(word) AS BIGINT) AS n FROM wn),
rec AS (
    SELECT word, n, CAST(0 AS BIGINT) AS j, [CAST(0 AS BIGINT)] AS acc
    FROM wl
    UNION ALL
    SELECT word, n, j + 1,
        list_append(acc,
            list_min(list_filter(
                list_transform(range(1, least({UNI_MAX_PIECE}, j + 1) + 1),
                    L -> {cand}),
                x -> x IS NOT NULL)))
    FROM rec WHERE j < n
),
wv AS (
    SELECT word,
           acc[CAST(n + 1 AS INT)] // {_NP_BASE} AS wcost,
           acc[CAST(n + 1 AS INT)] % {_NP_BASE} AS wpieces
    FROM rec WHERE j = n
)
SELECT d.doc_id,
       CAST(SUM(w.wpieces) AS BIGINT) AS n_unigram_tokens,
       CAST(SUM(w.wcost) AS BIGINT) AS cost_q16,
       CAST(CASE WHEN SUM(w.wpieces) = 0 THEN 0
                 ELSE d.n_chars * 1000000 // SUM(w.wpieces) END AS BIGINT)
           AS chars_per_token_e6
FROM dwf d JOIN wv w USING (word)
GROUP BY d.doc_id, d.n_chars
"""


QUERIES = {"text_unigram_apply": text_unigram_apply}
ORACLE_SQL = {"text_unigram_apply": _unigram_apply_oracle_sql()}
