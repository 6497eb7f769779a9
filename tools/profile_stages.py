"""Stage-level wall-clock attribution for the heavy composed registry
entries (optimization round 12, guide §1: measure first).

Replays each entry's own body with ``time.perf_counter()`` fences between
its sub-calls (the composed entries are sequential driver programs whose
stages end in actions — writes, collects, checkpoints — so wall-clock
attribution at the fence is exact).  Read-only: everything runs in the
same tempdir-per-entry sandbox the registry entries themselves use.

Usage: python tools/profile_stages.py [entry ...]   (default: all known)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    """Fence timer: t('label') records the span since the last fence."""

    def __init__(self) -> None:
        self.spans: dict[str, float] = {}
        self.last = time.perf_counter()

    def __call__(self, label: str) -> None:
        now = time.perf_counter()
        self.spans[label] = round(now - self.last, 3)
        self.last = now


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def prof_quality_lr_scored(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators.quality import (
        _qc_featbuckets, _qc_label_col, _quality_scored_wide, lr_train_model,
    )
    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table_spread,
    )

    t = T()
    wide = _quality_scored_wide(
        load_table_spread(spark, SF_DIR, "documents").select(
            "doc_id", "lang", "text"
        )
    )
    lab = wide.select("doc_id", _qc_label_col().alias("train_label"))
    fb = _qc_featbuckets(wide).localCheckpoint()
    t("featurize+checkpoint fb")
    model, bias = lr_train_model(spark, fb, lab)
    t("lr_train_model")
    per_doc = (
        fb.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("w").cast("long").alias("sw"),
        )
    )
    margin = F.lit(bias) + F.coalesce("sw", F.lit(0))
    out = (
        wide.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(lab, "doc_id", "left")
        .select(
            "doc_id", "train_label",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            margin.cast("long").alias("lr_margin_q16"),
            (margin > 0).alias("predicted_high"),
        )
    )
    _noop(out)
    t("score+serve")
    return t.spans


def prof_lr_train(spark) -> dict:
    """lr_train_model broken into its own fences."""
    from engineering_school_bigdata_project_f1_weather_spark.operators import quality as q
    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table_spread,
    )

    t = T()
    wide = q._quality_scored_wide(
        load_table_spread(spark, SF_DIR, "documents").select(
            "doc_id", "lang", "text"
        )
    )
    lab = wide.select("doc_id", q._qc_label_col().alias("train_label"))
    fb = q._qc_featbuckets(wide).localCheckpoint()
    t("featurize fb")
    docs_bs = (
        fb.join(lab.where(F.col("train_label").isNotNull()), "doc_id")
        .groupBy("doc_id", "train_label")
        .agg(F.collect_list("b").alias("bs"))
        .localCheckpoint()
    )
    t("stage docs_bs")
    n_rows = int(docs_bs.count())
    t(f"count (n={n_rows})")
    model, bias = q._lr_train_driver(spark, docs_bs, max(n_rows, 1))
    t("driver loop")
    return t.spans


def prof_dedup_er_incremental(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    docs = dedup._docs(spark, SF_DIR).select("doc_id", "lang", "text")
    tmp = tempfile.mkdtemp(prefix="prof_er_")
    try:
        dedup.er_index_init(spark, docs.where(F.col("doc_id") % 2 == 0), tmp)
        t("er_index_init")
        dedup.er_index_update(spark, docs.where(F.col("doc_id") % 2 == 1), tmp)
        t("er_index_update")
        _noop(dedup.er_resolve(spark, tmp).localCheckpoint())
        t("er_resolve")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t.spans


def prof_er_index_init(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.functions import snapshots
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    docs = dedup._docs(spark, SF_DIR).select("doc_id", "lang", "text").where(
        F.col("doc_id") % 2 == 0
    )
    tmp = tempfile.mkdtemp(prefix="prof_eri_")
    try:
        os.makedirs(tmp, exist_ok=True)
        base = os.path.join(tmp, "er_v0")
        drows = dedup._er_doc_rows(docs).localCheckpoint()
        t("doc rows (featurize+score+md5)")
        sig = dedup.minhash_signatures(spark, docs).localCheckpoint()
        t("minhash signatures")
        grams = dedup._er_doc_grams(drows).localCheckpoint()
        t("doc grams")
        dford = (
            grams.groupBy("x").agg(F.count(F.lit(1)).alias("df0"))
            .localCheckpoint()
        )
        t("dford")
        qg = dedup._er_qgram_prefix(drows, dford, grams=grams).localCheckpoint()
        t("qgram prefix")
        edges = dedup._er_edges(spark, drows, drows, sig, sig, qg, qg)
        labels = dedup._er_closure(spark, edges)
        t("edges+closure")
        ent = (
            drows.select("doc_id")
            .join(labels, F.col("doc_id") == labels.node, "left")
            .select(
                "doc_id",
                F.coalesce("component", F.col("doc_id")).alias("entity"),
            )
        )
        drows.write.mode("overwrite").parquet(f"{base}/docs")
        t("write docs")
        sig.write.mode("overwrite").parquet(f"{base}/sig")
        qg.write.mode("overwrite").parquet(f"{base}/qg")
        dford.write.mode("overwrite").parquet(f"{base}/dford")
        ent.write.mode("overwrite").parquet(f"{base}/labels")
        spark.createDataFrame([], dedup._ER_EMPTY_REMAP).write.mode(
            "overwrite"
        ).parquet(f"{base}/remap")
        snapshots.snap_commit(tmp, "er_v0", "er_v")
        t("write sig/qg/dford/labels/remap+commit")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t.spans


def prof_curate_incremental(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        curate_index as ci,
    )
    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table_spread,
    )

    t = T()
    docs = load_table_spread(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    vecs = load_table_spread(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    half = docs.agg(F.expr("div(max(doc_id), 2)").alias("h")).first()["h"]
    t("half split")
    tmp = tempfile.mkdtemp(prefix="prof_cur_")
    try:
        ci.curate_index_init(
            spark,
            docs.where(F.col("doc_id") <= half),
            vecs.where(F.col("vec_id") <= half),
            f"{tmp}/idx",
        )
        t("curate_index_init")
        ci.curate_index_update(
            spark,
            docs.where(F.col("doc_id") > half),
            vecs.where(F.col("vec_id") > half),
            f"{tmp}/idx",
        )
        t("curate_index_update")
        _noop(ci.curate_resolve(spark, f"{tmp}/idx").localCheckpoint())
        t("curate_resolve")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t.spans


def prof_curate_init(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.functions import snapshots
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        curate_index as ci,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators.dedup import (
        COMPONENT_MIN_JACCARD_E6, _minhash_live_dir, minhash_index_init,
        minhash_pairs_of,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators.quality import (
        _qc_featbuckets, _qc_label_col, _quality_scored_wide, qc_train_model,
    )
    from engineering_school_bigdata_project_f1_weather_spark.operators.similarity import (
        semdedup_index_init,
    )
    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table_spread,
    )

    t = T()
    docs_all = load_table_spread(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    )
    vecs_all = load_table_spread(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    half = docs_all.agg(F.expr("div(max(doc_id), 2)").alias("h")).first()["h"]
    docs = docs_all.where(F.col("doc_id") <= half)
    vectors = vecs_all.where(F.col("vec_id") <= half)
    index_path = tempfile.mkdtemp(prefix="prof_curi_") + "/idx"
    try:
        os.makedirs(index_path, exist_ok=True)
        d = docs.select("doc_id", "lang", "text").localCheckpoint()
        t("checkpoint docs")
        wide = _quality_scored_wide(d)
        lab = wide.select("doc_id", _qc_label_col().alias("train_label"))
        fb = _qc_featbuckets(wide).localCheckpoint()
        t("featurize fb")
        model, c_q16 = qc_train_model(spark, fb, lab)
        model.write.mode("overwrite").parquet(f"{index_path}/model")
        spark.createDataFrame([(int(c_q16),)], "c_q16 long").write.mode(
            "overwrite"
        ).parquet(f"{index_path}/model_meta")
        t("train+write model")
        minhash_index_init(spark, d, f"{index_path}/mh")
        t("minhash_index_init")
        semdedup_index_init(spark, vectors, f"{index_path}/sem")
        t("semdedup_index_init")
        sigs = spark.read.parquet(_minhash_live_dir(f"{index_path}/mh"))
        pairs = minhash_pairs_of(sigs, sigs).where(
            F.col("jaccard_e6") >= COMPONENT_MIN_JACCARD_E6
        ).select("doc_a", "doc_b", "jaccard_e6")
        model_b = F.broadcast(spark.read.parquet(f"{index_path}/model"))
        rows = ci._doc_rows(d, model_b, c_q16, wide=wide, fb=fb)
        snap = f"{ci.CUR_PREFIX}0"
        sdir = os.path.join(index_path, snap)
        rows.write.mode("overwrite").parquet(f"{sdir}/docs")
        t("score+write roster")
        pairs.write.mode("overwrite").parquet(f"{sdir}/pairs")
        snapshots.snap_commit(index_path, snap, ci.CUR_PREFIX)
        t("pairs+commit")
    finally:
        shutil.rmtree(os.path.dirname(index_path), ignore_errors=True)
    return t.spans


def prof_dedup_semantic_incremental(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        similarity as sim,
    )
    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table_spread,
    )

    t = T()
    vecs = load_table_spread(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    half = vecs.agg(F.expr("div(max(vec_id), 2)").alias("h")).first()["h"]
    tmp = tempfile.mkdtemp(prefix="prof_sem_")
    try:
        sim.semdedup_index_init(
            spark, vecs.where(F.col("vec_id") <= half), f"{tmp}/idx"
        )
        t("semdedup_index_init")
        sim.semdedup_index_update(
            spark, vecs.where(F.col("vec_id") > half), f"{tmp}/idx"
        )
        t("semdedup_index_update")
        _noop(sim.semdedup_resolve(spark, f"{tmp}/idx").localCheckpoint())
        t("resolve")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t.spans


def prof_er_probabilistic_entities(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    scored = dedup._fs_scored(spark, SF_DIR)
    edges = scored.where(F.col("is_match")).select("doc_a", "doc_b")
    edges = edges.localCheckpoint()
    t("_fs_scored+match edges")
    out = dedup._entities_of(spark, SF_DIR, dedup._docs(spark, SF_DIR), edges)
    _noop(out)
    t("entities (closure+rank)")
    return t.spans


def prof_fs_scored(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    docs = dedup._docs(spark, SF_DIR)
    hashes = docs.select(F.md5("text").alias("h"), "doc_id")
    keeper = hashes.groupBy("h").agg(F.min("doc_id").alias("k"))
    exact_p = (
        hashes.join(keeper, "h")
        .where(F.col("doc_id") != F.col("k"))
        .select(F.col("k").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    near_p = (
        dedup.dedup_minhash_lsh(spark, SF_DIR)
        .where(F.col("jaccard_e6") >= dedup.COMPONENT_MIN_JACCARD_E6)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    t("near pairs (minhash)")
    typo_p = (
        dedup.dedup_edit_distance(spark, SF_DIR)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    t("typo pairs (edjoin)")
    cands = (
        exact_p.unionByName(near_p).unionByName(typo_p).distinct()
    ).localCheckpoint()
    t("cands")
    ha = hashes.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("h_a"))
    hb = hashes.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("h_b"))
    g = (
        cands.join(ha, "doc_a")
        .join(hb, "doc_b")
        .join(near_p.withColumn("nr", F.lit(1)), ["doc_a", "doc_b"], "left")
        .join(typo_p.withColumn("ty", F.lit(1)), ["doc_a", "doc_b"], "left")
        .select(
            "doc_a", "doc_b",
            F.when(F.col("h_a") == F.col("h_b"), F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("g_exact"),
            F.coalesce("nr", F.lit(0)).cast("long").alias("g_near"),
            F.coalesce("ty", F.lit(0)).cast("long").alias("g_typo"),
        )
    )
    counts = (
        g.groupBy("g_exact", "g_near", "g_typo")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    t("gamma build + pattern counts")
    posts = dedup._fs_posts(
        sorted(
            (int(r["g_exact"]), int(r["g_near"]), int(r["g_typo"]), int(r["c"]))
            for r in counts
        )
    )
    t("driver EM")
    post_df = spark.createDataFrame(
        [
            (g1, g2, g3, p, bool(p >= dedup._FS_Q // 2))
            for (g1, g2, g3), p in posts.items()
        ],
        "g_exact long, g_near long, g_typo long, post_q16 long, "
        "is_match boolean",
    )
    _noop(
        g.join(
            F.broadcast(post_df), ["g_exact", "g_near", "g_typo"]
        ).select(
            "doc_a", "doc_b", "g_exact", "g_near", "g_typo",
            "post_q16", "is_match",
        )
    )
    t("serve join (gamma re-eval)")
    return t.spans


def prof_dedup_components(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    pairs = dedup.dedup_minhash_lsh(spark, SF_DIR).where(
        F.col("jaccard_e6") >= dedup.COMPONENT_MIN_JACCARD_E6
    ).localCheckpoint()
    n = pairs.count()
    t(f"minhash pairs (n={n})")
    labels = dedup.propagate_components(spark, pairs, "doc_a", "doc_b")
    _noop(labels)
    t("propagate_components")
    out = (
        dedup._docs(spark, SF_DIR)
        .select("doc_id")
        .join(labels, F.col("doc_id") == labels.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
    )
    _noop(out)
    t("final left join")
    return t.spans


def prof_dedup_substring_incremental(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    docs = dedup._docs(spark, SF_DIR).select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="prof_sub_")
    try:
        dedup.substr_index_init(
            spark, docs.where(F.col("doc_id") % 2 == 0), tmp
        )
        t("substr_index_init")
        dedup.substr_index_update(
            spark, docs.where(F.col("doc_id") % 2 == 1), tmp
        )
        t("substr_index_update")
        _noop(dedup.substr_resolve(spark, tmp).localCheckpoint())
        t("substr_resolve")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return t.spans


def prof_semdedup_init(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.functions import snapshots
    from engineering_school_bigdata_project_f1_weather_spark.operators import (
        similarity as sim,
    )
    from engineering_school_bigdata_project_f1_weather_spark.sources.tables import (
        load_table_spread,
    )

    t = T()
    vecs_all = load_table_spread(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    half = vecs_all.agg(F.expr("div(max(vec_id), 2)").alias("h")).first()["h"]
    vectors_df = vecs_all.where(F.col("vec_id") <= half)
    index_path = tempfile.mkdtemp(prefix="prof_semi_") + "/idx"
    k = sim.K_CENTROIDS
    try:
        os.makedirs(index_path, exist_ok=True)
        base = sim._quantize_vectors(vectors_df).cache()
        base.count()
        t("quantize+cache")
        cents = sim._train_centroids(spark, base, k=k)
        t("train centroids")
        cents.write.mode("overwrite").parquet(f"{index_path}/centroids")
        spark.createDataFrame([(int(k),)], "k long").write.mode(
            "overwrite"
        ).parquet(f"{index_path}/meta")
        t("write centroids+meta")
        withcs = sim._semantic_withcs(base, cents, k).localCheckpoint()
        t("withcs (assign) + checkpoint")
        cand = (
            withcs.select(F.col("vec_id").alias("vec_a"), "cluster_id")
            .join(
                withcs.select(F.col("vec_id").alias("vec_b"), "cluster_id"),
                "cluster_id",
            )
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
        )
        dominated = sim._semantic_dominated(cand, withcs)
        sdir = f"{index_path}/sem_v0"
        sim._semdedup_write_vectors(withcs, f"{sdir}/vectors")
        t("write vectors (hive)")
        dominated.write.mode("overwrite").parquet(f"{sdir}/dominated")
        snapshots.snap_commit(index_path, "sem_v0", "sem_v")
        t("dominated verify+write+commit")
    finally:
        shutil.rmtree(os.path.dirname(index_path), ignore_errors=True)
    return t.spans


def prof_substr_init(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.functions import snapshots
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    docs = dedup._docs(spark, SF_DIR).select("doc_id", "text").where(
        F.col("doc_id") % 2 == 0
    )
    index_path = tempfile.mkdtemp(prefix="prof_subi_")
    try:
        base = os.path.join(index_path, "sub_v0")
        d = docs.select("doc_id", "text")
        occ = dedup._substr_occ(d).localCheckpoint()
        t("occ (shingle) + checkpoint")
        dup = (
            occ.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .select("h")
            .localCheckpoint()
        )
        t("dup digests")
        spans = dedup._substr_spans(occ.join(dup, "h").select("doc_id", "pos"))
        d.select("doc_id").write.mode("overwrite").parquet(f"{base}/docs")
        t("spans plan + write docs")
        dedup._write_occ_bucketed(occ, f"{base}/occ", dedup.OCC_BUCKET_CHARS)
        t("write occ bucketed")
        dup.write.mode("overwrite").parquet(f"{base}/dup")
        spans.write.mode("overwrite").parquet(f"{base}/spans")
        dedup._occ_width_write(base, dedup.OCC_BUCKET_CHARS)
        snapshots.snap_commit(index_path, "sub_v0", "sub_v")
        t("write dup+spans+commit")
    finally:
        shutil.rmtree(index_path, ignore_errors=True)
    return t.spans


def prof_edit_distance(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    d = dedup._edit_docs(spark, SF_DIR)
    pgram, prefix, cand = dedup._edit_surfaces(d)
    n = cand.count()
    t(f"surfaces+cand count (n={n})")
    ta = d.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    tb = d.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    out = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn(
            "edit_dist",
            F.levenshtein("_ta", "_tb", dedup.EDIT_TAU).cast("long"),
        )
        .where(F.col("edit_dist") >= 0)
        .select("doc_a", "doc_b", "edit_dist")
    )
    _noop(out)
    t("verify")
    return t.spans


def prof_minhash(spark) -> dict:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    t = T()
    _noop(dedup.dedup_minhash_lsh(spark, SF_DIR))
    t("cold")
    _noop(dedup.dedup_minhash_lsh(spark, SF_DIR))
    t("warm")
    return t.spans


PROFILES = {
    "semdedup_init": prof_semdedup_init,
    "substr_init": prof_substr_init,
    "edit_distance": prof_edit_distance,
    "minhash": prof_minhash,
    "quality_lr_scored": prof_quality_lr_scored,
    "lr_train": prof_lr_train,
    "dedup_er_incremental": prof_dedup_er_incremental,
    "er_index_init": prof_er_index_init,
    "curate_incremental": prof_curate_incremental,
    "curate_init": prof_curate_init,
    "dedup_semantic_incremental": prof_dedup_semantic_incremental,
    "er_probabilistic_entities": prof_er_probabilistic_entities,
    "fs_scored": prof_fs_scored,
    "dedup_components": prof_dedup_components,
    "dedup_substring_incremental": prof_dedup_substring_incremental,
}


def main() -> None:
    names = sys.argv[1:] or list(PROFILES)
    spark = get_spark("profile-stages", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    out = {}
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        out[name] = PROFILES[name](spark)
        out[name]["TOTAL"] = round(time.perf_counter() - t0, 3)
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
