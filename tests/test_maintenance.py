"""Lake maintenance: idempotent partition backfill, compaction, schema
evolution — the destructive-if-wrong settings pinned by test."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.sources.maintenance import (
    backfill_partitions,
    compact_partitions,
    partition_file_counts,
    read_evolved,
)


def _day_events(spark, sf_dir):
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import load_events

    return load_events(spark, sf_dir).withColumn(
        "day", F.date_format(F.timestamp_micros("ts_us"), "yyyy-MM-dd")
    ).drop("ts_us")


def test_backfill_touches_only_target_partitions(spark, sf_dir, tmp_path):
    path = str(tmp_path / "lake")
    base = _day_events(spark, sf_dir)
    backfill_partitions(base, path, ["day"])
    days = [r.day for r in base.select("day").distinct().orderBy("day").collect()]
    target = days[0]

    before = {
        (r.day, r.event_id) for r in spark.read.parquet(path).select("day", "event_id").collect()
    }
    # backfill one day with modified values (value doubled)
    patch = base.where(F.col("day") == target).withColumn("value", F.col("value") * 2)
    backfill_partitions(patch, path, ["day"])

    after_df = spark.read.parquet(path)
    after = {(r.day, r.event_id) for r in after_df.select("day", "event_id").collect()}
    # no partition lost, no rows lost (static overwrite mode would have
    # wiped every other day)
    assert after == before
    # the patch really landed
    v_new = after_df.where(F.col("day") == target).agg(F.sum("value")).collect()[0][0]
    v_old = base.where(F.col("day") == target).agg(F.sum("value")).collect()[0][0]
    assert abs(v_new - 2 * v_old) < 1e-6
    # idempotent: re-running converges
    backfill_partitions(patch, path, ["day"])
    assert spark.read.parquet(path).count() == len(before)


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "frag")
    base = _day_events(spark, sf_dir)
    # fragment: many files per partition (streaming-ingest shape)
    base.repartition(8).write.partitionBy("day").parquet(path)
    days = sorted(partition_file_counts(spark, path))
    assert partition_file_counts(spark, path)[days[0]] > 1

    rows_before = spark.read.parquet(path).count()
    target = days[0].split("=", 1)[1]
    compact_partitions(spark, path, ["day"], 1, predicate=f"day = '{target}'")

    counts = partition_file_counts(spark, path)
    assert counts[days[0]] == 1, counts[days[0]]
    # untouched partitions keep their fragmentation (proof of scoping)
    assert counts[days[-1]] > 1
    assert spark.read.parquet(path).count() == rows_before


def test_read_evolved_surfaces_new_columns(spark, tmp_path):
    path = str(tmp_path / "evo")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(path)
    spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(7).alias("v2")
    ).write.mode("append").parquet(path)

    df = read_evolved(spark, path)
    assert set(df.columns) == {"id", "v1", "v2"}
    assert df.count() == 8
    assert df.where(F.col("v2").isNull()).count() == 5


def test_stream_foreachbatch_into_lake_then_compact(spark, sf_dir, tmp_path):
    """The streaming->lake shape: micro-batches append day-partitioned
    parquet (fragmenting partitions), compaction then rewrites touched
    days to one file each — rows identical to the batch ground truth."""
    from engineering_school_bigdata_project_f1_weather_spark.schemas import TESTDATA_SCHEMAS

    src_dir = str(tmp_path / "src")
    base = _day_events(spark, sf_dir)
    base.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src_dir, mode="overwrite"
    )
    base.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src_dir, mode="append"
    )

    lake = str(tmp_path / "lake")
    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .withColumn(
            "day",
            F.date_format(F.col("ts"), "yyyy-MM-dd"),
        )
    )

    def sink(batch_df, _batch_id):
        batch_df.write.partitionBy("day").mode("append").parquet(lake)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    counts = partition_file_counts(spark, lake)
    frag_day = max(counts, key=counts.get)
    assert counts[frag_day] >= 2, counts  # two micro-batches fragmented it

    compact_partitions(spark, lake, ["day"], 1)
    counts2 = partition_file_counts(spark, lake)
    assert all(v == 1 for k, v in counts2.items()), counts2

    got = spark.read.parquet(lake)
    assert got.count() == base.count()
    assert got.select(F.sum("event_id")).collect()[0][0] == \
        base.select(F.sum("event_id")).collect()[0][0]
