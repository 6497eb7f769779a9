"""Physical-plan regression tests — pin the scale-critical properties the
engine relies on (SURVEY §4.2 / §4.3): parquet predicate pushdown + column
pruning, partition pruning on a partitioned lake, broadcast joins in the
combine model, and top-k compiling to TakeOrderedAndProject instead of a
global sort. A correctness-neutral refactor that silently loses one of
these would only show up at cluster scale — these tests catch it at test
scale."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators.marts import q9_top10
from engineering_school_bigdata_project_f1_weather_spark.plans.f1_model import combined
from engineering_school_bigdata_project_f1_weather_spark.sources.tables import load_table


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_parquet_filter_pushdown_and_column_pruning(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 30.0)
        .select("l_orderkey", "l_quantity")
    )
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in plan
    # ReadSchema must carry only the two projected columns, not all 10.
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_shipdate" not in read_schema


def test_partition_pruning_on_partitioned_lake(spark, sf_dir, tmp_path):
    lake = str(tmp_path / "events_by_type")
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import load_events

    load_events(spark, sf_dir).write.partitionBy("event_type").parquet(
        lake, mode="overwrite"
    )
    df = spark.read.parquet(lake).where(F.col("event_type") == "purchase")
    plan = _formatted(df)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf and "purchase" in pf
    # the data filter must NOT degrade into a post-scan filter on all rows
    assert df.count() > 0


def test_combine_model_joins_are_broadcast(spark, sf_dir):
    plan = _formatted(combined(spark, sf_dir))
    # fact-side model build: every dimension join is broadcast-hash; the
    # only exchanges are the window shuffle and broadcast distribution.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both fact tables on the join key co-locates matching rows
    at write time, so the orders ⋈ lineitem join needs NO Exchange — at
    100 TB that shuffle IS the bottleneck, and bucketed layout removes it
    from every downstream join on the same key."""
    n_buckets = 8
    (
        load_table(spark, sf_dir, "orders")
        .write.bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .write.bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_bucketed")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bucketed")
        li = spark.table("lineitem_bucketed")
        j = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _formatted(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_q9_topk_is_take_ordered(spark, sf_dir):
    plan = _formatted(q9_top10(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # a LIMIT 10 must never materialize a global Sort of the full input
    assert "Sort " not in plan or "TakeOrderedAndProject" in plan


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """The eval shingle set must broadcast — a corpus-side shuffle for the
    semi-join would be the 100 TB mistake."""
    from engineering_school_bigdata_project_f1_weather_spark.operators.corpus import text_contamination

    plan = _formatted(text_contamination(spark, sf_dir))
    assert "BroadcastExchange" in plan


def test_chunking_adds_no_shuffle(spark, sf_dir):
    """Chunking is a narrow 1:N explode: no Exchange beyond the input
    spread repartition (RoundRobin), and in particular no hash shuffle."""
    from engineering_school_bigdata_project_f1_weather_spark.operators.corpus import text_chunk

    plan = _formatted(text_chunk(spark, sf_dir))
    assert "hashpartitioning" not in plan
    assert "explode(sequence" in plan


def test_text_search_is_take_ordered_with_broadcast_idf(spark, sf_dir):
    """Retrieval serving: top-k must compile to TakeOrderedAndProject
    (never a global sort of all scored docs) and the idf table must be
    broadcast (it is |query| rows — shuffling the corpus against it
    would be the scale mistake)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators.search import text_search

    plan = _formatted(text_search(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_events_resample_broadcasts_spine(spark, sf_dir):
    """The calendar-grid joins must broadcast (spine × types is metadata
    next to the fact scan) — a SortMergeJoin here would shuffle the
    whole counts table against a few thousand grid rows."""
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import events_resample

    plan = _formatted(events_resample(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_join_key_includes_salt(spark, sf_dir):
    """The salted join's physical join key must include the salt column —
    that is the property that scatters a hot user_id across reducers."""
    from engineering_school_bigdata_project_f1_weather_spark.operators.events import (
        events_user_spend_salted,
    )

    plan = _formatted(events_user_spend_salted(spark, sf_dir))
    assert "_salt" in plan


def test_events_scd2_single_shuffle(spark, sf_dir):
    """SCD2 shares ONE user_id hash partitioning across the change-flag
    window, the run-id window, the run aggregation, and the lead()
    window — exactly one Exchange in the whole plan (the second window's
    (user_id, run_id) ordering needs only a local re-Sort)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators.temporal import (
        events_scd2,
    )

    plan = _formatted(events_scd2(spark, sf_dir))
    head = plan.split("\n\n", 1)[0]
    assert head.count("Exchange") == 1, head
    assert "CartesianProduct" not in plan


def test_sim_knn_graph_no_cartesian_single_arrow_stage(spark, sf_dir):
    """The kNN graph never enumerates all pairs (no CartesianProduct; the
    only nested-loop join is the K-centroid broadcast fan-out) and the
    exact-cosine verify is ONE fused Arrow stage (one MapInPandas/
    ArrowEvalPython node, not a per-expression chain)."""
    from engineering_school_bigdata_project_f1_weather_spark.operators.similarity import (
        sim_knn_graph,
    )

    plan = _formatted(sim_knn_graph(spark, sf_dir))
    head = plan.split("\n\n", 1)[0]
    assert "CartesianProduct" not in plan
    n_python = sum(
        head.count(marker) for marker in ("MapInPandas", "ArrowEvalPython")
    )
    assert n_python == 1, head
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_substr_occ_probe_prunes_buckets(spark, sf_dir, tmp_path):
    """The substring-dedup occ log is stored hive-partitioned on the
    digest's leading byte (round 10, VERDICT r9 item 4); an update-time
    probe filtered to the batch's touched buckets must (a) land as a
    PartitionFilters entry on the parquet scan — pruning metadata, not
    just file locality — and (b) actually read fewer partitions than
    the full log."""
    import os

    from engineering_school_bigdata_project_f1_weather_spark.functions import (
        snapshots,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    docs = dedup._docs(spark, sf_dir).select("doc_id", "text")
    idx = str(tmp_path / "subidx")
    dedup.substr_index_init(spark, docs, idx)
    base = os.path.join(idx, snapshots.snap_live(idx))

    # on-disk layout: hive partition dirs, >1 bucket at any real SF
    hb_dirs = [d for d in os.listdir(f"{base}/occ") if d.startswith("hb=")]
    assert len(hb_dirs) > 1

    occ = dedup._read_occ(spark, f"{base}/occ")
    # probe two buckets that actually exist (bucket width is the
    # OCC_BUCKET_CHARS capacity knob — derive values, don't hardcode)
    touch = sorted(d.split("=", 1)[1] for d in hb_dirs)[:2]
    probe = occ.where(F.col("hb").isin(touch))
    plan = _formatted(probe)
    assert "PartitionFilters" in plan and "hb" in plan.split("PartitionFilters", 1)[1][:200]
    # the pruned scan touches only the named buckets
    pruned_files = probe.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    assert 0 < len(pruned_files) < len(hb_dirs)
    assert all(any(f"/hb={t}/" in r.f for t in touch) for r in pruned_files)


def test_semdedup_vectors_probe_prunes_clusters(spark, sf_dir, tmp_path):
    """The semantic-dedup index stores vectors hive-partitioned on the
    cluster ('cb' — round 11); an update-time probe filtered to the
    batch's touched clusters must (a) land as a PartitionFilters entry
    on the parquet scan and (b) actually read fewer partitions than the
    full table — the occ-log pruning contract, embedding side."""
    import os

    from engineering_school_bigdata_project_f1_weather_spark.functions import (
        snapshots,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        similarity,
    )

    vecs = similarity.load_table_spread(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "semidx_plan")
    similarity.semdedup_index_init(spark, vecs, idx)
    base = os.path.join(idx, snapshots.snap_live(idx))

    cb_dirs = [
        d for d in os.listdir(f"{base}/vectors") if d.startswith("cb=")
    ]
    assert len(cb_dirs) > 1

    stored = spark.read.parquet(f"{base}/vectors")
    touch = sorted(d.split("=", 1)[1] for d in cb_dirs)[:2]
    probe = stored.where(F.col("cb").isin(touch))
    plan = _formatted(probe)
    assert "PartitionFilters" in plan
    assert "cb" in plan.split("PartitionFilters", 1)[1][:200]
    pruned_files = probe.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    assert 0 < len(pruned_files) < len(cb_dirs)
    assert all(any(f"/cb={t}/" in r.f for t in touch) for r in pruned_files)
