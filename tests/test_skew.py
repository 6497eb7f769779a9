"""Salted-join parity: scattering a hot key across salt buckets must not
change join results (inner and left, incl. unmatched fact keys)."""

from __future__ import annotations

import pyspark.sql.functions as F

from engineering_school_bigdata_project_f1_weather_spark.operators.events import load_events
from engineering_school_bigdata_project_f1_weather_spark.operators.skew import salted_join


def _frames(spark, sf_dir):
    # event_type has 5 hot values over every event row — a structurally
    # skewed join key. Dim: per-type aggregate, with one type dropped so
    # the left join has unmatched fact rows.
    e = load_events(spark, sf_dir).select("event_id", "event_type", "user_id")
    dim = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("type_total"))
        .where(F.col("event_type") != "error")
    )
    return e, dim


def _key(rows):
    return sorted(tuple(r) for r in rows)


def test_salted_inner_join_parity(spark, sf_dir):
    e, dim = _frames(spark, sf_dir)
    plain = e.join(dim, "event_type", "inner")
    salted = salted_join(e, dim, ["event_type"], salt_from=["event_id"], n_salt=8)
    cols = sorted(plain.columns)
    assert sorted(salted.columns) == cols
    assert _key(plain.select(*cols).collect()) == _key(salted.select(*cols).collect())


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    e, dim = _frames(spark, sf_dir)
    plain = e.join(dim, "event_type", "left")
    salted = salted_join(e, dim, ["event_type"], salt_from=["event_id"], n_salt=8, how="left")
    cols = sorted(plain.columns)
    got = _key(salted.select(*cols).collect())
    exp = _key(plain.select(*cols).collect())
    assert got == exp
    # unmatched rows ('error' events) really are present with NULL dim cols
    assert any(r[-1] is None or None in tuple(r) for r in got)
