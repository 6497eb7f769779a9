"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(`decode_image` raises NotImplementedError; `multimodal_features` uses a
deterministic byte-level feature extractor instead). Everything around the
stub — binary column creation, schema declaration, Arrow batch transfer,
partition-parallel pandas iteration — is real and oracle-tested.

Scale notes: mapInPandas streams Arrow record batches per partition; no
driver collection, no per-row Python. At 100 TB the payload column stays
columnar parquet (binary) and only batches in flight are materialized.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.tables import load_table_spread

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("md5_hex", T.StringType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real decoder hook — requires an image codec, not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/libjpeg; wire your codec here — the "
        "Spark-side plumbing (binary column → mapInPandas batches) is what "
        "this module provides"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level features per Arrow batch (the stub stand-in
    for decode/resize/feature-extract)."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int64"),
                "md5_hex": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "head_hex": payloads.map(lambda b: b[:8].hex()),
            }
        )


def with_payload(df: DataFrame) -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of the text — the test
    stand-in for an image/audio blob) plus typed metadata."""
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.col("text")).cast("long").alias("payload_len"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via mapInPandas (Arrow batches)."""
    d = with_payload(load_table_spread(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


FRAME_BYTES = 32
MAX_FRAMES = 4

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1:N frame sampling per payload — the video-frame-extraction batch
    shape (each input row yields up to MAX_FRAMES output rows)."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = min((len(payload) + FRAME_BYTES - 1) // FRAME_BYTES, MAX_FRAMES)
            for i in range(n):
                frame = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_len"].append(len(frame))
                out["frame_md5"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(out)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (1:N mapInPandas) — the decode
    step is a deterministic byte-slice stand-in (no codecs in this
    container); the partitioning/batching/explosion plumbing is real."""
    d = with_payload(load_table_spread(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        _frame_batches, schema=FRAME_SCHEMA
    )


ENERGY_FRAME = 32  # bytes per analysis window

ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
    ]
)


def _energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL numpy decode (not a hash stub): the payload is interpreted as a
    uint8 waveform (`np.frombuffer`), reshaped into full ENERGY_FRAME-byte
    windows, and each window's energy (Σ sample²) is computed vectorized —
    the audio-feature-extraction batch shape. Exact integer output, so the
    DuckDB oracle reproduces it with ord() arithmetic."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "energy": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(payload, dtype=np.uint8)
            m = len(a) // ENERGY_FRAME
            if m == 0:
                continue
            e = (
                a[: m * ENERGY_FRAME]
                .astype(np.int64)
                .reshape(m, ENERGY_FRAME)
                ** 2
            ).sum(axis=1)
            out["doc_id"].extend([doc_id] * m)
            out["frame_idx"].extend(range(m))
            out["energy"].extend(int(x) for x in e)
        yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "energy"]).astype(
            {"doc_id": "int64", "frame_idx": "int32", "energy": "int64"}
        )


def multimodal_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed waveform energy over binary payloads — the one multimodal
    operator whose decode is fully implemented (numpy, vectorized per
    Arrow batch) rather than stubbed, because the 'codec' is raw uint8."""
    d = with_payload(load_table_spread(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        _energy_batches, schema=ENERGY_SCHEMA
    )


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the BINARY payload column — content-hash grouping
    on the blob itself (the image/audio twin of ``dedup.dedup_exact``,
    which hashes text): md5 of the raw bytes, one hash-keyed partial-agg
    shuffle, keeper = min doc_id. At 100 TB this is the first pass of any
    multimodal pipeline (byte-identical re-crawls/copies collapse before
    any expensive decode), and the hash is computed JVM-side on the
    binary column — no Python in this one."""
    d = with_payload(load_table_spread(spark, sf_dir, "documents"))
    return (
        d.groupBy(F.md5(F.col("payload")).alias("payload_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
            F.min("payload_len").alias("payload_len"),
        )
    )


ENERGY_BUCKET = 50_000  # coarse energy quantum per analysis window


def multimodal_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-style fingerprint dedup over binary payloads: each
    clip's windowed-energy profile (the REAL numpy decode from
    ``multimodal_energy``) is coarsely quantized per window
    (``div(energy, ENERGY_BUCKET)``) and the ordered bucket sequence is
    hashed into one fingerprint per clip — clips whose content differs
    only by perturbations below the energy quantum collapse into the
    same group (the Shazam/Chromaprint shape: robust features → coarse
    quantize → hash → exact join).  Byte-identical copies always agree;
    small edits agree unless they cross a bucket boundary — a recall
    trade documented here, deterministic in both engines.

    Plan: Arrow-batched decode (mapInPandas) → per-clip ordered
    aggregation keyed on doc_id (one shuffle; the profile string is
    |frames| buckets, bounded by payload size) → fingerprint groupBy
    (second partial-agg shuffle).  Only groups with ≥ 2 clips are
    reported — the dedup candidates.
    """
    e = multimodal_energy(spark, sf_dir).withColumn(
        "bucket", F.expr(f"div(energy, {ENERGY_BUCKET})")
    )
    profiles = e.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("frame_idx", "bucket"))
                    ),
                    lambda s: s.bucket.cast("string"),
                ),
            )
        ).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_frames"),
    )
    return (
        profiles.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.min("doc_id").alias("keeper_id"),
            F.min("n_frames").alias("n_frames"),
        )
        .where(F.col("n_clips") >= 2)
        .orderBy(F.desc("n_clips"), "keeper_id")
    )


ENERGY_ACTIVE_MIN = 314_000  # frames at/above the corpus median are "active"


def multimodal_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity segmentation over the decoded energy track — the
    silence-removal / clip-splitting step of an audio pipeline: frames
    below the energy threshold are dropped, and the surviving frames are
    grouped into maximal CONSECUTIVE runs (gaps-and-islands on
    frame_idx) per clip.  Output: one row per segment with its frame
    span and exact energy mass.

    Composes the real numpy decode (``multimodal_energy``) with pure
    windows: one doc-keyed shuffle serves the lag() island detection and
    the run aggregation — the same single-partitioning trick as
    ``events_sessionize``, applied downstream of an Arrow stage.
    """
    e = multimodal_energy(spark, sf_dir).where(
        F.col("energy") >= ENERGY_ACTIVE_MIN
    )
    from pyspark.sql import Window

    order = Window.partitionBy("doc_id").orderBy("frame_idx")
    flagged = e.withColumn(
        "new_seg",
        F.when(
            F.lag("frame_idx").over(order).isNull()
            | (F.col("frame_idx") - F.lag("frame_idx").over(order) > 1),
            1,
        ).otherwise(0),
    )
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = flagged.withColumn("seg", F.sum("new_seg").over(running))
    return (
        seg.groupBy("doc_id", "seg")
        .agg(
            F.min("frame_idx").cast("int").alias("start_frame"),
            F.max("frame_idx").cast("int").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("energy").cast("long").alias("energy_sum"),
        )
        .select(
            "doc_id",
            F.col("seg").cast("long").alias("seg"),
            "start_frame",
            "end_frame",
            "n_frames",
            "energy_sum",
        )
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frames": multimodal_frames,
    "multimodal_energy": multimodal_energy,
    "multimodal_dedup": multimodal_dedup,
    "multimodal_fingerprint": multimodal_fingerprint,
    "multimodal_segments": multimodal_segments,
}

# Text is ASCII, so byte ops ≡ char ops; md5(text) ≡ md5(utf8 payload).
ORACLE_SQL = {
    "multimodal_features": """
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               md5(text) AS md5_hex,
               lower(hex(encode(substr(text, 1, 8)))) AS head_hex
        FROM documents
    """,
    "multimodal_energy": f"""
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(list_sum(list_transform(
                   range(1, {ENERGY_FRAME} + 1),
                   j -> ord(substr(text, i * {ENERGY_FRAME} + j, 1))
                        * ord(substr(text, i * {ENERGY_FRAME} + j, 1))
               )) AS BIGINT) AS energy
        FROM documents,
             unnest(range(0, strlen(text) // {ENERGY_FRAME})) AS t(i)
    """,
    "multimodal_frames": f"""
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(strlen(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS BIGINT)
                   AS frame_len,
               md5(substr(text, i * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
        FROM documents,
             unnest(range(0, least(
                 (strlen(text) + {FRAME_BYTES} - 1) // {FRAME_BYTES},
                 {MAX_FRAMES}))) AS t(i)
    """,
    # ASCII text ⇒ md5(text) ≡ md5(utf8-encoded payload bytes).
    "multimodal_dedup": """
        SELECT md5(text) AS payload_md5,
               COUNT(*) AS n_copies,
               MIN(doc_id) AS keeper_id,
               CAST(MIN(strlen(text)) AS BIGINT) AS payload_len
        FROM documents GROUP BY md5(text)
    """,
    "multimodal_fingerprint": f"""
        WITH e AS (
            SELECT doc_id, CAST(i AS INT) AS frame_idx,
                   CAST(list_sum(list_transform(
                       range(1, {ENERGY_FRAME} + 1),
                       j -> ord(substr(text, i * {ENERGY_FRAME} + j, 1))
                            * ord(substr(text, i * {ENERGY_FRAME} + j, 1))
                   )) AS BIGINT) // {ENERGY_BUCKET} AS bucket
            FROM documents,
                 unnest(range(0, strlen(text) // {ENERGY_FRAME})) AS t(i)
        ),
        profiles AS (
            SELECT doc_id,
                   md5(string_agg(CAST(bucket AS VARCHAR), ','
                                  ORDER BY frame_idx)) AS fingerprint,
                   COUNT(*) AS n_frames
            FROM e GROUP BY doc_id
        )
        SELECT fingerprint, COUNT(*) AS n_clips, MIN(doc_id) AS keeper_id,
               CAST(MIN(n_frames) AS BIGINT) AS n_frames
        FROM profiles
        GROUP BY fingerprint
        HAVING COUNT(*) >= 2
        ORDER BY n_clips DESC, keeper_id
    """,
    "multimodal_segments": f"""
        WITH e AS (
            SELECT doc_id, CAST(i AS INT) AS frame_idx,
                   CAST(list_sum(list_transform(
                       range(1, {ENERGY_FRAME} + 1),
                       j -> ord(substr(text, i * {ENERGY_FRAME} + j, 1))
                            * ord(substr(text, i * {ENERGY_FRAME} + j, 1))
                   )) AS BIGINT) AS energy
            FROM documents,
                 unnest(range(0, strlen(text) // {ENERGY_FRAME})) AS t(i)
        ),
        active AS (SELECT * FROM e WHERE energy >= {ENERGY_ACTIVE_MIN}),
        flagged AS (
            SELECT *,
                   CASE WHEN lag(frame_idx) OVER w IS NULL
                             OR frame_idx - lag(frame_idx) OVER w > 1
                        THEN 1 ELSE 0 END AS new_seg
            FROM active
            WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
        ),
        segs AS (
            SELECT *,
                   CAST(SUM(new_seg) OVER (
                       PARTITION BY doc_id ORDER BY frame_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS seg
            FROM flagged
        )
        SELECT doc_id, seg,
               CAST(MIN(frame_idx) AS INT) AS start_frame,
               CAST(MAX(frame_idx) AS INT) AS end_frame,
               COUNT(*) AS n_frames,
               CAST(SUM(energy) AS BIGINT) AS energy_sum
        FROM segs GROUP BY doc_id, seg
    """,
}
