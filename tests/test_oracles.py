"""In-pytest oracle gate: run the driver-style Spark-vs-DuckDB comparison
for one representative query per family at sf0.001 — the full sweep lives
in tools/selfcheck.py; this keeps `pytest` alone exercising the
comparator path (canonical hash, pandas dtypes) end-to-end."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.selfcheck import TABLES, canon_rows

REPRESENTATIVES = [
    "q1_wins",            # reference mart
    "p3_combined",        # pipeline stage
    "tpch_grouping_sets", # OLAP
    "orders_above_avg",   # correlated subquery
    "dedup_minhash_lsh",  # dedup family
    "sim_clusters",       # iterative + similarity
    "text_langid_ngram",  # trained text op
    "text_chunk",         # corpus prep
    "events_funnel",      # event analytics
    "weather_melt",       # reshape
    "dq_lineitem",        # data quality
    "multimodal_energy",  # numpy decode path
    "stream_hourly",      # drained streaming vs batch SQL (round 3)
    "sim_ivf_trained",    # unrolled-Lloyd's oracle (round 3)
    "text_pii",           # regex scrub (round 3)
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = entrymod.queries()[name](spark, sf_dir)
    spdf = sdf.toPandas()
    dpdf = duck.execute(entrymod.oracle_sql()[name]).df()
    assert len(spdf) == len(dpdf) > 0 or name in ("events_funnel",)
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    sh, _ = canon_rows(list(spdf.columns), list(spdf.itertuples(index=False, name=None)))
    dh, _ = canon_rows(list(dpdf.columns), list(dpdf.itertuples(index=False, name=None)))
    assert sh == dh, f"{name}: value hash mismatch"
