"""The training-data curation pipeline as one callable DAG — the corpus
counterpart of :mod:`pipeline` (which runs the reference's F1/weather
flow): documents in → curated, split, chunked training shards out, plus
the manifest a downstream trainer reads.

Stages (each a declarative plan from :mod:`operators`):

1. gate     — corpus_curate's per-doc keep decision (quality ∧ exact-dup
              keeper ∧ near-dup cluster keeper), materialized per doc.
2. split    — deterministic md5-bucket train/val/test assignment.
3. chunk    — overlapping token windows over KEPT docs only.
4. write    — day-free layout: ``{out}/chunks`` partitioned by
              (split, lang); idempotent via dynamic partition overwrite.
5. manifest — per-(split, lang) doc/chunk/token census next to the data.

Scale notes: gates and split are one scan + the pair-graph pass; chunking
explodes only the surviving docs; the write partitions by (split, lang)
so a trainer's reader prunes to its split without listing the rest.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .functions.texts import tokens
from .operators.corpus import (
    SPLIT_BUCKETS,
    TRAIN_LT,
    VAL_LT,
    text_chunk,
)
from .operators.curate import QUALITY_MIN_TTR_E6
from .operators.dedup import dedup_components
from .operators.text import QUALITY_MAX_TOKENS, QUALITY_MIN_TOKENS
from .functions import texts
from .sources.maintenance import backfill_partitions
from .sources.tables import load_table_spread


@dataclass
class CurateResult:
    n_docs: int
    n_kept: int
    n_chunks: int
    chunks_path: str
    manifest: list[dict] = field(default_factory=list)


def kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc keep decision + split assignment (stages 1-2)."""
    d = load_table_spread(spark, sf_dir, "documents").withColumn(
        "toks", tokens(F.col("text"))
    )
    n = F.size("toks").cast("long")
    ttr = F.expr("div(size(array_distinct(toks)) * 1000000, size(toks))")
    hash_keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    bucket = texts.hash32(F.col("doc_id").cast("string")) % SPLIT_BUCKETS
    split = (
        F.when(bucket < TRAIN_LT, F.lit("train"))
        .when(bucket < VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.withColumn("n_tokens", n)
        .withColumn(
            "q",
            (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
            & (F.col("n_tokens") <= QUALITY_MAX_TOKENS)
            & (ttr > QUALITY_MIN_TTR_E6),
        )
        .withColumn("ek", F.col("doc_id") == hash_keeper)
        .join(dedup_components(spark, sf_dir), "doc_id")
        .withColumn(
            "kept",
            F.col("q") & F.col("ek") & (F.col("doc_id") == F.col("component")),
        )
        .withColumn("split", split)
        .select("doc_id", "lang", "split", "n_tokens", "kept")
    )


def run(spark: SparkSession, sf_dir: str, out_dir: str) -> CurateResult:
    """documents → curated (split, lang)-partitioned chunk shards + manifest."""
    gated = kept_docs(spark, sf_dir).cache()
    keep = gated.where("kept").select("doc_id", "lang", "split")

    chunks = (
        text_chunk(spark, sf_dir)
        .join(keep, "doc_id")  # only surviving docs are chunked
        .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text", "split", "lang")
    )
    chunks_path = f"{out_dir}/chunks"
    backfill_partitions(chunks, chunks_path, ["split", "lang"])

    written = spark.read.parquet(chunks_path)
    manifest_rows = (
        written.groupBy("split", "lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("n_tokens"),
        )
        .orderBy("split", "lang")
        .collect()
    )
    res = CurateResult(
        n_docs=gated.count(),
        n_kept=keep.count(),
        n_chunks=written.count(),
        chunks_path=chunks_path,
        manifest=[r.asDict() for r in manifest_rows],
    )
    gated.unpersist()
    return res
