"""orders_distribution / documents_zipf / multimodal_fingerprint: oracle
parity at sf0.001 plus each operator's semantic invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod
from engineering_school_bigdata_project_f1_weather_spark.operators import (
    analytics,
    multimodal,
    search,
)
from tools.selfcheck import canon_rows

TRIO = ["orders_distribution", "documents_zipf", "multimodal_fingerprint"]


@pytest.mark.parametrize("name", TRIO)
def test_matches_oracle(name, spark, sf_dir, duck):
    spdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    dpdf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert len(spdf) == len(dpdf) > 0
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    sh, _ = canon_rows(list(spdf.columns), list(spdf.itertuples(index=False, name=None)))
    dh, _ = canon_rows(list(dpdf.columns), list(dpdf.itertuples(index=False, name=None)))
    assert sh == dh


def test_distribution_bounds_and_extremes(spark, sf_dir):
    """percent_rank spans [0, 1e6] within each priority; cume_dist ends at
    exactly 1e6 for each group's maximum and pr_ppm never overflows (the
    rank×1e6 product wrapped int32 before the widen — regression pin)."""
    out = analytics.orders_distribution(spark, sf_dir)
    assert out.where((F.col("pr_ppm") < 0) | (F.col("pr_ppm") > 1_000_000)).count() == 0
    assert out.where((F.col("cd_ppm") <= 0) | (F.col("cd_ppm") > 1_000_000)).count() == 0
    tops = (
        out.groupBy("o_orderpriority")
        .agg(F.max("pr_ppm").alias("mx"), F.max("cd_ppm").alias("mc"))
        .collect()
    )
    for r in tops:
        assert r.mx == 1_000_000
        assert r.mc == 1_000_000


def test_zipf_ranks_are_dense_and_shares_bounded(spark, sf_dir):
    rows = search.documents_zipf(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert 1_000_000 - len(rows) <= sum(r.share_ppm for r in rows) <= 1_000_000


def test_fingerprint_supersets_exact_binary_dedup(spark, sf_dir):
    """Every byte-identical duplicate group must collapse into one
    fingerprint group too (coarse quantization can only MERGE more), so
    fingerprint groups ≤ exact groups and total clips covered ≥ exact
    duplicate clips."""
    exact = (
        multimodal.multimodal_dedup(spark, sf_dir)
        .where(F.col("n_copies") >= 2)
        .agg(
            F.count(F.lit(1)).alias("groups"),
            F.sum("n_copies").alias("clips"),
        )
        .collect()[0]
    )
    fp = multimodal.multimodal_fingerprint(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("groups"), F.sum("n_clips").alias("clips")
    ).collect()[0]
    assert fp.groups  # near-dups collapse at every SF
    if exact.groups:  # sf0.001 has no byte-identical pairs — vacuous there
        assert fp.clips >= exact.clips
