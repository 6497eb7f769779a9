"""End-to-end corpus curation — the training-data funnel composed from the
building blocks as ONE declarative plan:

    quality gate (text.py thresholds)
      ∧ exact-dup keeper (min doc_id per content hash, a window over md5)
      ∧ near-dup cluster keeper (dedup_components: doc_id == component)
    → per-language corpus stats (docs / tokens, total vs kept)

The gates are evaluated independently on the full corpus (a quality-dropped
cluster keeper therefore drops its whole cluster — the conservative choice
for training data), and the oracle reproduces the entire funnel including
the connected-components fixpoint via a recursive CTE.

Scale: one scan of documents for the gates (window over the content hash is
one shuffle), plus the component labels from the iterative pair-graph pass;
the final rollup is a partial+final agg on `lang`. Nothing driver-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.texts import tokens
from ..sources.tables import load_table_spread
from .dedup import (
    COMPONENT_MIN_JACCARD_E6,
    _components_oracle_sql,
    dedup_components,
)
from .text import QUALITY_MAX_TOKENS, QUALITY_MIN_TOKENS

QUALITY_MIN_TTR_E6 = 100_000  # same gate as text.text_quality


def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_spread(spark, sf_dir, "documents").withColumn(
        "toks", tokens(F.col("text"))
    )
    base = d.select(
        "doc_id",
        "lang",
        "text",
        F.size("toks").cast("long").alias("n_tokens"),
        F.expr("div(size(array_distinct(toks)) * 1000000, size(toks))").alias(
            "ttr_e6"
        ),
    )
    hash_keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    flags = (
        base.withColumn(
            "q",
            (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
            & (F.col("n_tokens") <= QUALITY_MAX_TOKENS)
            & (F.col("ttr_e6") > QUALITY_MIN_TTR_E6),
        )
        .withColumn("ek", F.col("doc_id") == hash_keeper)
        .join(dedup_components(spark, sf_dir), "doc_id")
        .withColumn("kept", F.col("q") & F.col("ek") & (F.col("doc_id") == F.col("component")))
    )
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0)).alias(
                "tokens_kept"
            ),
        )
        .orderBy("lang")
    )


def _curate_oracle_sql() -> str:
    # _components_oracle_sql() is itself a full WITH RECURSIVE … SELECT;
    # embed it as a derived table so its CTE scope stays local.
    return f"""
WITH comp AS (
    SELECT * FROM ({_components_oracle_sql()})
),
base AS (
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           (len(list_distinct(string_split(text, ' '))) * 1000000)
               // len(string_split(text, ' ')) AS ttr_e6,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS hash_keeper
    FROM documents
),
flags AS (
    SELECT b.lang, b.n_tokens,
           (b.n_tokens BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS}
            AND b.ttr_e6 > {QUALITY_MIN_TTR_E6}
            AND b.doc_id = b.hash_keeper
            AND b.doc_id = c.component) AS kept
    FROM base b JOIN comp c USING (doc_id)
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
FROM flags
GROUP BY lang
"""


QUERIES = {"corpus_curate": corpus_curate}
ORACLE_SQL = {"corpus_curate": _curate_oracle_sql()}

# keep the import visible to linters — the threshold is part of the funnel
# definition even though only the oracle string references it textually.
_ = COMPONENT_MIN_JACCARD_E6
