"""Cross-engine kernels in functions/ — exactness pins."""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from engineering_school_bigdata_project_f1_weather_spark.functions import intlog


def _duck_ilog2(vals: list[int]) -> dict[int, int]:
    con = duckdb.connect()
    con.sql("CREATE TABLE t(k INT, x BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(vals))
    )
    q = intlog.ilog2_steps_sql("t", {"l": "x"}, ["k"])
    return dict(con.sql(f"SELECT k, l FROM {q} _q").fetchall())


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1),
                min_size=1, max_size=40))
def test_ilog2_python_equals_duckdb(vals):
    got = _duck_ilog2(vals)
    for k, v in enumerate(vals):
        assert got[k] == intlog.ilog2_q16(v), v


def test_ilog2_edge_values_and_precision():
    # powers of two are exact: log2(2^k) = k << 16
    for k in range(0, 62):
        assert intlog.ilog2_q16(1 << k) == k << intlog.LOG2_FRAC_BITS
    # defined 0 at 0 (both realizations — the degenerate-count guard)
    assert intlog.ilog2_q16(0) == 0
    assert _duck_ilog2([0])[0] == 0
    # precision: within 2**-16 + normalization truncation of true log2
    for v in (3, 7, 1000, 123456789, 2**40 + 12345, 2**61 + 99):
        q = intlog.ilog2_q16(v) / intlog.LOG2_ONE
        assert abs(q - math.log2(v)) < 2e-5, v
