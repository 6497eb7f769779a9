"""Batch/stream parity: the streaming plans must produce the same results
as the batch operators when drained with availableNow."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators.events import (
    events_hourly,
    load_events,
)
from engineering_school_bigdata_project_f1_weather_spark.streaming import events_stream


def test_hourly_stream_matches_batch(spark, sf_dir):
    stream = events_stream.stream_events(spark, sf_dir)
    out = events_stream.run_available_now(
        events_stream.hourly_counts_stream(stream), "hourly_mem", spark
    )
    got = {
        (r.hour, r.event_type): (r.n_events, r.value_cents_sum)
        for r in out.collect()
    }
    batch = events_hourly(spark, sf_dir).collect()
    # batch hour_us is epoch-micros; stream hour is a session-tz timestamp of
    # the same instant — compare via epoch micros.
    exp = {}
    for r in batch:
        exp[(r.hour_us, r.event_type)] = (r.n_events, r.value_cents_sum)
    got_us = {
        (int(k[0].timestamp() * 1_000_000), k[1]): v for k, v in got.items()
    }
    assert got_us == exp


def test_session_stream_matches_batch_session_window(spark, sf_dir):
    stream = events_stream.stream_events(spark, sf_dir)
    out = events_stream.run_available_now(
        events_stream.sessions_stream(stream), "sessions_mem", spark
    )
    streamed = {
        (r.user_id, r.session_start, r.n_events) for r in out.collect()
    }
    # batch equivalent with the same session_window operator
    batch_events = load_events(spark, sf_dir).withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    )
    batch = (
        batch_events.groupBy(
            F.session_window("event_time", events_stream.SESSION_GAP),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
        .collect()
    )
    batched = {(r.user_id, r.session_start, r.n_events) for r in batch}
    assert streamed == batched
    assert len(streamed) > 0
