"""Text expression helpers shared by the dedup / text-analysis operators.

All of these are JVM-side built-in expressions (split / md5 / conv /
higher-order array functions) — no Python in the hot path — and each has an
exact DuckDB twin so operator outputs hash-match the oracle:

- token/shingle hashing uses the first 8 hex chars of md5 → uint32, via
  ``conv(hex, 16, 10)`` (Spark) / ``CAST('0x…' AS BIGINT)`` (DuckDB);
  both engines agree on md5, so the integer domain is identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# English-ish stopword list used by langid / quality scoring. Shared with
# the generated oracle SQL — single source of truth.
STOPWORDS = ["the", "a", "of", "is", "and", "to", "in", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    return F.split(text, " ")


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles of a raw text column.

    NOTE: prefer projecting ``tokens(text)`` into its own column and calling
    :func:`shingles_of_tokens` — higher-order lambdas are interpreted, so a
    ``split`` embedded in the lambda body re-runs per element (O(tokens^2)
    per doc)."""
    return shingles_of_tokens(tokens(text), k)


def shingles_of_tokens(t: Column, k: int = 3) -> Column:
    """Distinct k-token shingles ('w1 w2 w3') over a pre-split token array.
    Empty array when the doc has fewer than k tokens (guards Spark's
    descending ``sequence``)."""
    n = F.size(t)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    # transform over the index array, concatenating k consecutive tokens
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, i + j) for j in range(k)]
        ),
    )
    return F.array_distinct(sh)


def shingle_frame(
    d: DataFrame,
    k: int = 3,
    doc_col: str = "doc_id",
    out: str = "g",
    dedup: bool = True,
) -> DataFrame:
    """(doc_col, out): DISTINCT k-token shingles of a (doc_col, text)
    frame — the FRAME-level twin of :func:`shingles_of_tokens`, built
    entirely from whole-stage-codegen operators (posexplode + window
    ``lead`` + concat_ws + distinct).

    ``dedup=False`` skips the per-doc set dedup and returns raw shingle
    OCCURRENCE rows (positional duplicates included) — for consumers
    whose downstream aggregates absorb duplicates anyway (min-hash
    signatures: MIN over rows and collect_set both ignore repeats), the
    extra aggregation is pure per-batch latency (~0.4 s measured on the
    incremental-index batch, the round-6 bench-gate finding).

    Why it exists (round 6): higher-order array lambdas are interpreted
    (~10 µs/element), and the per-row transform was measured as the
    DOMINANT scaling term of every shingle consumer (17.8 s of
    text_sparse_sim's 58 s sf0.5 probe — SCALE.md).  This form pays ONE
    narrow (doc, pos, token) shuffle for the window and keeps every
    expression in codegen; identical shingle set (docs under k tokens
    yield no rows, duplicates collapse).  The per-doc dedup reuses the
    window's doc_id hash partitioning (collect_set + explode instead of
    a global DISTINCT — the groupBy's requirement is satisfied by the
    window child, so no second exchange; the round-6 bench gate caught
    the two-shuffle version regressing the loop-shaped consumers)."""
    wt = Window.partitionBy(doc_col).orderBy("pos")
    leads = [F.lead("tok", j).over(wt).alias(f"_t{j}") for j in range(1, k)]
    rows = (
        d.select(doc_col, F.posexplode(tokens(F.col("text"))).alias("pos", "tok"))
        .select(doc_col, "tok", *leads)
        .where(F.col(f"_t{k - 1}").isNotNull())
        .select(
            doc_col,
            F.concat_ws(
                " ", "tok", *[f"_t{j}" for j in range(1, k)]
            ).alias(out),
        )
    )
    if not dedup:
        return rows
    return (
        rows.groupBy(doc_col)
        .agg(F.collect_set(out).alias("_shset"))
        .select(doc_col, F.explode("_shset").alias(out))
    )


def shingles_sql(text_expr: str, k: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-based list indexing)."""
    toks = f"string_split({text_expr}, ' ')"
    # Build the indexed accesses directly from `toks` — no post-hoc textual
    # replace, which would corrupt the SQL if text_expr ever contained the
    # replaced token.
    concat = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(k))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {k - 2}, 1)), "
        f"i -> {concat}))"
    )


def hash32(col: Column) -> Column:
    """uint32 hash of a string via md5 prefix — identical across engines."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"
