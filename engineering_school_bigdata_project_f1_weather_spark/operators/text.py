"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting. All built-in expressions (split / higher-order
filters / regexp) — zero Python in the hot path, fully distributable.

Ratios are reported as ``*_e6`` integers (``div(x * 1e6, n)``) so the
DuckDB oracle matches exactly (no float-division drift).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.texts import STOPWORDS, tokens
from ..sources.tables import load_table_spread

LANGID_MIN_RATIO_E6 = 20_000  # ≥2% stopwords → 'en'
QUALITY_MIN_TOKENS = 20
QUALITY_MAX_TOKENS = 1000
TOKEN_RE = "[a-z0-9]+"

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _with_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table_spread(spark, sf_dir, "documents").withColumn(
        "toks", tokens(F.col("text"))
    )


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + regex (BPE-ish pre-tokenizer)
    word counts + byte length."""
    d = _with_tokens(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0))
        .cast("long")
        .alias("n_tokens_re"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID heuristic (n-gram-free variant): the
    fraction of tokens in an English stopword list decides 'en' vs 'und'."""
    d = _with_tokens(spark, sf_dir)
    hits = F.size(
        F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS))
    ).cast("long")
    n = F.size("toks").cast("long")
    ratio = F.expr(f"div(size(filter(toks, t -> t IN ({_STOP_SQL}))) * 1000000, size(toks))")
    return d.select(
        "doc_id",
        "lang",
        hits.alias("stop_hits"),
        n.alias("n_tokens"),
        ratio.alias("stop_ratio_e6"),
        F.when(ratio >= LANGID_MIN_RATIO_E6, F.lit("en"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token counts, type-token ratio, mean token length,
    stopword ratio, and a boolean keep/drop gate — the usual pre-training
    corpus filter shape."""
    d = _with_tokens(spark, sf_dir)
    n = F.size("toks").cast("long")
    n_distinct = F.size(F.array_distinct("toks")).cast("long")
    char_sum = F.aggregate(
        F.transform(F.col("toks"), F.length),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("long")
    ttr = F.expr("div(size(array_distinct(toks)) * 1000000, size(toks))")
    stop_ratio = F.expr(
        f"div(size(filter(toks, t -> t IN ({_STOP_SQL}))) * 1000000, size(toks))"
    )
    avg_len = F.expr(
        "div(aggregate(transform(toks, t -> length(t)), 0, (a, v) -> a + v) * 1000000, size(toks))"
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        char_sum.alias("char_sum"),
        ttr.alias("ttr_e6"),
        avg_len.alias("avg_token_len_e6"),
        stop_ratio.alias("stop_ratio_e6"),
        (
            (n >= QUALITY_MIN_TOKENS)
            & (n <= QUALITY_MAX_TOKENS)
            & (F.expr("div(size(array_distinct(toks)) * 1000000, size(toks))") > 100_000)
        ).alias("keep"),
    )


LANGID_EVAL_STRIDE = 100  # doc_id % 100 == 0 → labeled profile-training set


def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language ID, profile-trained on labeled data.

    The classic n-gram langid shape (Cavnar-Trenkle style) done
    relationally: (1) build per-language bigram frequency profiles from
    the labeled subset (doc_id % STRIDE == 0), weights as exact
    ``count*1e6 // lang_total`` integers; (2) score every other document
    against every profile via a broadcast join on the bigram and one
    (doc_id, lang) partial-agg; (3) argmax with a deterministic
    lang-ascending tie-break.

    Scale: profiles are tiny (|langs| × |bigram vocab|) and broadcast —
    the corpus side shuffles once on (doc_id, cand_lang). Accuracy on this
    synthetic corpus is incidental (lang labels are independent of the
    word-soup text); what the oracle pins is the exact relational
    semantics of train→score→argmax.
    """
    d = load_table_spread(spark, sf_dir, "documents")
    big = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "flatten(transform(split(text, ' '), "
                "t -> transform(sequence(1, greatest(length(t) - 1, 1)), "
                "i -> substring(t, i, 2))))"
            )
        ).alias("g"),
    )
    labeled = big.where(F.col("doc_id") % LANGID_EVAL_STRIDE == 0)
    counts = labeled.groupBy(F.col("lang").alias("cand_lang"), "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("cand_lang").agg(F.sum("c").alias("tot"))
    profile = counts.join(totals, "cand_lang").select(
        "cand_lang", "g", F.expr("div(c * 1000000, tot)").alias("w_e6")
    )
    corpus = big.where(F.col("doc_id") % LANGID_EVAL_STRIDE != 0)
    scored = (
        corpus.join(F.broadcast(profile), "g")
        .groupBy("doc_id", "lang", "cand_lang")
        .agg(F.sum("w_e6").alias("score_e6"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_e6"), F.asc("cand_lang")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("cand_lang").alias("lang_pred"), "score_e6")
    )
    # docs whose bigrams all miss the profiles keep a row with pred 'und'
    return (
        corpus.select("doc_id", "lang")
        .distinct()
        .join(best, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
            F.coalesce("score_e6", F.lit(0)).alias("score_e6"),
        )
    )


def _langid_ngram_oracle_sql() -> str:
    return f"""
WITH big AS (
    SELECT doc_id, lang, unnest(flatten(list_transform(
        string_split(text, ' '),
        t -> list_transform(range(1, greatest(strlen(t), 2)),
                            i -> substr(t, i, 2))))) AS g
    FROM documents
),
counts AS (
    SELECT lang AS cand_lang, g, COUNT(*) AS c
    FROM big WHERE doc_id % {LANGID_EVAL_STRIDE} = 0
    GROUP BY lang, g
),
totals AS (SELECT cand_lang, SUM(c) AS tot FROM counts GROUP BY cand_lang),
profile AS (
    SELECT cand_lang, g, (c * 1000000) // tot AS w_e6
    FROM counts JOIN totals USING (cand_lang)
),
corpus AS (SELECT * FROM big WHERE doc_id % {LANGID_EVAL_STRIDE} <> 0),
scored AS (
    SELECT doc_id, lang, cand_lang, CAST(SUM(w_e6) AS BIGINT) AS score_e6
    FROM corpus JOIN profile USING (g)
    GROUP BY doc_id, lang, cand_lang
),
best AS (
    SELECT doc_id, lang, cand_lang AS lang_pred, score_e6 FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score_e6 DESC, cand_lang ASC) AS rn
        FROM scored
    ) WHERE rn = 1
)
SELECT c.doc_id, c.lang,
       COALESCE(b.lang_pred, 'und') AS lang_pred,
       CAST(COALESCE(b.score_e6, 0) AS BIGINT) AS score_e6
FROM (SELECT DISTINCT doc_id, lang FROM corpus) c
LEFT JOIN best b ON b.doc_id = c.doc_id AND b.lang = c.lang
"""


COLLOC_MIN_SUPPORT = 5
COLLOC_TOPK = 100


def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the corpus's most-associated adjacent word
    pairs, ranked by the Dice coefficient ``2·n(w1,w2)/(n(w1)+n(w2))``
    in e6 fixed point.

    Dice instead of PMI on purpose: PMI needs ``N_tokens²`` in the
    numerator (overflow at corpus scale) or a float ``log`` (bit
    divergence across engines); Dice is the standard collocation
    measure that stays in small exact integers — the numerator is
    bounded by 2e6·min(n1,n2) at ANY corpus size, so the arithmetic
    that is exact at sf0.01 is the same arithmetic that runs at 100 TB.

    Plan: one explode → (w1,w2) partial-agg shuffle for bigram counts
    (adjacent pairs via the same slice/zip_with shape as BPE pair
    counting), one explode → token shuffle for unigram counts, two
    vocabulary-sized equi-joins (strategy left to AQE — vocabulary
    grows with the corpus, so no pinned broadcast), support filter,
    TakeOrderedAndProject for the top-k. Never a global sort.
    """
    d = load_table_spread(spark, sf_dir, "documents").select(
        tokens(F.col("text")).alias("t")
    )
    n = F.size("t")
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, n - 1),
        F.slice(F.col("t"), 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = (
        d.where(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy("p.w1", "p.w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= COLLOC_MIN_SUPPORT)
    )
    uni = (
        d.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n2"))
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.expr("div(2 * n_pair * 1000000, n1 + n2)").alias("dice_e6"),
        )
    )
    return scored.orderBy(
        F.desc("dice_e6"), F.asc("w1"), F.asc("w2")
    ).limit(COLLOC_TOPK)


_COLLOC_ORACLE = f"""
WITH toks AS (
    SELECT string_split(text, ' ') AS t FROM documents
),
big AS (
    SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS n_pair
    FROM (SELECT unnest(list_zip(t[1:-2], t[2:-1])) AS p
          FROM toks WHERE len(t) >= 2)
    GROUP BY 1, 2
    HAVING COUNT(*) >= {COLLOC_MIN_SUPPORT}
),
uni AS (
    SELECT w, COUNT(*) AS n_w
    FROM (SELECT unnest(t) AS w FROM toks)
    GROUP BY w
)
SELECT b.w1, b.w2,
       CAST(b.n_pair AS BIGINT) AS n_pair,
       CAST(u1.n_w AS BIGINT) AS n1,
       CAST(u2.n_w AS BIGINT) AS n2,
       (2 * b.n_pair * 1000000) // (u1.n_w + u2.n_w) AS dice_e6
FROM big b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
ORDER BY dice_e6 DESC, w1 ASC, w2 ASC
LIMIT {COLLOC_TOPK}
"""


QUERIES = {
    "text_tokens": text_tokens,
    "text_langid": text_langid,
    "text_langid_ngram": text_langid_ngram,
    "text_quality": text_quality,
    "text_collocations": text_collocations,
}

ORACLE_SQL = {
    "text_collocations": _COLLOC_ORACLE,
    "text_langid_ngram": _langid_ngram_oracle_sql(),
    "text_tokens": f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
               CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens_re,
               CAST(strlen(text) AS BIGINT) AS n_chars_calc
        FROM documents
    """,
    "text_langid": f"""
        WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id, lang,
               CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS BIGINT) AS stop_hits,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               (len(list_filter(toks, t -> t IN ({_STOP_SQL}))) * 1000000) // len(toks)
                   AS stop_ratio_e6,
               CASE WHEN (len(list_filter(toks, t -> t IN ({_STOP_SQL}))) * 1000000)
                         // len(toks) >= {LANGID_MIN_RATIO_E6}
                    THEN 'en' ELSE 'und' END AS lang_pred
        FROM t
    """,
    "text_quality": f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               CAST(list_sum(list_transform(toks, t -> strlen(t))) AS BIGINT) AS char_sum,
               (len(list_distinct(toks)) * 1000000) // len(toks) AS ttr_e6,
               (CAST(list_sum(list_transform(toks, t -> strlen(t))) AS BIGINT) * 1000000)
                   // len(toks) AS avg_token_len_e6,
               (len(list_filter(toks, t -> t IN ({_STOP_SQL}))) * 1000000) // len(toks)
                   AS stop_ratio_e6,
               len(toks) BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS}
                   AND (len(list_distinct(toks)) * 1000000) // len(toks) > 100000
                   AS keep
        FROM t
    """,
}
