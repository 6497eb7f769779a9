"""Property-based pins (hypothesis) for the shared scalar helpers.

These helpers are the determinism contract between Spark and every DuckDB
oracle (times, vector quantization, text hashing) — the properties below
hold for ALL inputs, not just fixture rows. Each example list is batched
into ONE DataFrame so a hypothesis run costs one Spark job."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from engineering_school_bigdata_project_f1_weather_spark.functions import texts, times, vectors

_SETTINGS = dict(max_examples=12, deadline=None)

hms = st.tuples(
    st.integers(0, 9),      # hours
    st.integers(0, 59),     # minutes
    st.integers(0, 59),     # seconds
    st.integers(0, 99),     # centiseconds
)


@settings(**_SETTINGS)
@given(st.lists(hms, min_size=1, max_size=30))
def test_format_parse_roundtrip(spark, cases):
    """format_hms(parse_seconds('H:MM:SS.cc')) reproduces the canonical
    string, and parse agrees with exact arithmetic to 1e-9."""
    rows = []
    for h, m, s, cs in cases:
        canon = f"{h:02d}:{m:02d}:{s:02d}.{cs:02d}"
        rows.append((f"{h}:{m:02d}:{s:02d}.{cs:02d}", canon, h * 3600 + m * 60 + s + cs / 100))
    df = spark.createDataFrame(rows, "raw string, canon string, total double")
    out = df.select(
        "canon",
        "total",
        times.parse_seconds(F.col("raw")).alias("parsed"),
        times.format_hms(times.parse_seconds(F.col("raw"))).alias("rt"),
    ).collect()
    for r in out:
        assert abs(r.parsed - r.total) < 1e-9, r
        assert r.rt == r.canon, r


vec = st.lists(
    st.floats(-30, 30, allow_nan=False, allow_infinity=False, width=32),
    min_size=8,
    max_size=8,
)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=20))
def test_quantized_dot_matches_python_integers(spark, cases):
    """vectors.dot(quantize(a), quantize(b)) is EXACTLY the Python integer
    dot of floor(x*1024+0.5) — order-independent, engine-independent."""
    import math

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)],
        "i long, a array<float>, b array<float>",
    )
    out = {
        r.i: r.d
        for r in df.select(
            "i",
            vectors.dot(
                vectors.quantize(F.col("a")), vectors.quantize(F.col("b"))
            ).alias("d"),
        ).collect()
    }
    for i, (a, b) in enumerate(cases):
        qa = [math.floor(float(F32(x)) * 1024 + 0.5) for x in a]
        qb = [math.floor(float(F32(x)) * 1024 + 0.5) for x in b]
        assert out[i] == sum(x * y for x, y in zip(qa, qb)), (i, a, b)


def F32(x: float) -> float:
    """Round-trip through float32 the way the array<float> column does."""
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


text_strat = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA1, exclude_characters="\x7f"),
    min_size=0,
    max_size=40,
)


@settings(**_SETTINGS)
@given(st.lists(text_strat, min_size=1, max_size=30))
def test_hash32_matches_python_md5(spark, cases):
    """texts.hash32 == int(md5(utf8)[:8], 16) for arbitrary unicode —
    the bucket assignments every sampler/shuffler/splitter relies on."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    out = {
        r.i: r.h
        for r in df.select("i", texts.hash32(F.col("s")).alias("h")).collect()
    }
    for i, s in enumerate(cases):
        expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
        assert out[i] == expect, (i, s)


# ---- winnowing guarantee (Schleimer/Wilkerson/Aiken) ------------------
# Any match of >= W + K - 1 consecutive tokens between two documents MUST
# share at least one winnowing fingerprint — the paper's detection
# guarantee, and the property that makes winnow_matches a sound
# candidate generator (no guaranteed-length plagiarism can escape).
_tok = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@settings(max_examples=15, deadline=None)
@given(
    prefix_a=st.lists(_tok, min_size=0, max_size=8),
    suffix_a=st.lists(_tok, min_size=0, max_size=8),
    prefix_b=st.lists(_tok, min_size=0, max_size=8),
    suffix_b=st.lists(_tok, min_size=0, max_size=8),
    common=st.lists(_tok, min_size=6, max_size=12),  # >= W + K - 1 = 6
)
def test_winnow_guarantee_shared_run_shares_fingerprint(
    spark, tmp_path_factory, prefix_a, suffix_a, prefix_b, suffix_b, common
):
    import uuid

    import pyspark.sql.functions as F

    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    assert len(common) >= dedup.WINNOW_W + dedup.WINNOW_K - 1

    doc_a = " ".join(prefix_a + common + suffix_a)
    doc_b = " ".join(prefix_b + common + suffix_b)
    d = str(tmp_path_factory.mktemp("winnow") / f"sf_{uuid.uuid4().hex[:6]}")
    import os

    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        [(1, doc_a, "en", "src:1", len(doc_a)), (2, doc_b, "en", "src:1", len(doc_b))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    fps = dedup.dedup_winnow(spark, d)
    a = {r.fp for r in fps.where(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.where(F.col("doc_id") == 2).collect()}
    assert a & b, (
        f"guarantee violated: no shared fingerprint for shared run "
        f"{common!r} (|run|={len(common)})"
    )
