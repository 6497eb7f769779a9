"""Generate scale-probe tables under .scaledata/sf{SF}/ (default 0.5).

Round 8 (VERDICT r7 item 8): parameterized by a CLI arg so the heavy
tail gets a THIRD measured decade — `python tools/gen_scaledata.py 1.0`
writes a 10x-of-sf0.1 dataset under the same scaling laws.

The driver ships sf0.001/0.01/0.1; the scale-slope probe (SCALE.md) wants
a SECOND decade for its three heaviest entries (graph_triangles,
text_sparse_sim, dedup_components) so the 100x claims carry two decades
of evidence (VERDICT r4 item 5). No network and no DuckDB tpch extension
in the container, so this produces a 5x-of-sf0.1 dataset that mirrors
how the DRIVER's own generator scales (measured on sf0.01 vs sf0.1):

- documents: vocabulary FIXED (31 words, shared across langs), word
  length ~ Uniform[10, 100], words uniform over the vocab, lang
  proportions (en .41, de/es/fr/zh ~.15), sources exactly uniform over
  src0..src19. 25,000 FRESHLY-SAMPLED docs (seed 425) — replication
  would make every doc a 5-way exact clone and inflate near-dup density
  25x, which is NOT how the driver scales (uniq_texts/docs stays ~1.0
  at each sf); fresh sampling preserves the chance-collision near-dup
  rate the tiny vocabulary induces.
- lineitem: 5 copies of sf0.1 with disjoint l_orderkey / l_partkey
  offsets. The driver's own scaling holds orders-per-part density
  constant (60k lineitems / 2k parts at sf0.01, 600k / 20k at sf0.1 —
  30 each), and key-offset replication preserves exactly that density
  while growing both universes 5x. Other columns are carried through
  unchanged (the probed entry reads only orderkey/partkey; the full
  schema keeps load_table_spread happy).
- events (round 6, for the stream-join probes): the driver scales rows
  AND users 10x per decade over a FIXED Jan 1-30 span (10k/150 at
  sf0.01, 100k/1500 at sf0.1), ts uniform over the span, event_type
  uniform over 5 types, value ~ Exp(mean 50) rounded to cents (measured
  median 34.7 = 50·ln2, max ≈ 50·ln n), props = {"k": Uniform[0,99]}.
  sf0.5 = 500k rows / 7500 users, same span (per-user event density
  thereby constant — the property the stream joins' state size depends
  on).
- embeddings (round 6, for the ANN probes): unit-norm 64-dim gaussian
  vectors (measured: per-dim std = 1/8 = normalized N(0,1)^64, mean
  pairwise cos 0.0, no structure), label ~ Uniform[0,9]. The driver's
  row count scales x4 per x10 data (500 → 2000), i.e. n ∝ sf^0.602, so
  sf0.5 gets round(2000·5^0.602) = 5263 vectors.

Deterministic: fixed seeds, no wall-clock. Output is ~70 MB and
.gitignored; re-run this script to regenerate.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
OUT = os.path.join(ROOT, ".scaledata", f"sf{SF:g}")
SRC = "/root/testdata/sf0.1"
MULT = SF / 0.1  # scale vs the driver's largest shipped dataset

# The exact 31-word vocabulary of the driver's documents tables
# (SELECT DISTINCT unnest(string_split(text,' ')) over sf0.1).
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
N_DOCS = round(50_000 * SF)  # driver law: 5k at sf0.1
REPLICAS = round(MULT)


def gen_documents(rng: np.random.Generator) -> pa.Table:
    assert len(VOCAB) == 31, len(VOCAB)
    lengths = rng.integers(10, 101, size=N_DOCS)
    langs = rng.choice(len(LANGS), size=N_DOCS, p=LANG_P)
    texts = []
    for n in lengths:
        idx = rng.integers(0, len(VOCAB), size=int(n))
        texts.append(" ".join(VOCAB[i] for i in idx))
    return pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[i] for i in langs]),
            "source": pa.array([f"src{i % 20}" for i in range(N_DOCS)]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def gen_lineitem(con: duckdb.DuckDBPyConnection) -> None:
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/lineitem.parquet'"
        ).fetchall()
    ]
    carried = ", ".join(
        c for c in cols if c not in ("l_orderkey", "l_partkey")
    )
    union = "\nUNION ALL\n".join(
        f"SELECT l_orderkey + {r * 10_000_000} AS l_orderkey, "
        f"l_partkey + {r * 1_000_000} AS l_partkey, {carried} "
        f"FROM '{SRC}/lineitem.parquet'"
        for r in range(REPLICAS)
    )
    con.execute(
        f"COPY ({union}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)"
    )


def gen_tpch_side_tables(con: duckdb.DuckDBPyConnection) -> None:
    """orders/part replicate with the SAME key offsets as lineitem (so
    every fact-fact and fact-dim join keeps its sf0.1 match density:
    each lineitem replica joins its own orders/part copy); supplier /
    customer / nation / region carry through unchanged — l_suppkey and
    o_custkey are carried in the fact replicas, so per-supplier and
    per-customer fact density grows 5×, exactly like the pair-density
    rule the lineitem replication already encodes (round 7, for the
    deep-OLAP slope probes)."""
    cols_o = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/orders.parquet'"
        ).fetchall()
    ]
    carried_o = ", ".join(c for c in cols_o if c != "o_orderkey")
    union_o = "\nUNION ALL\n".join(
        f"SELECT o_orderkey + {r * 10_000_000} AS o_orderkey, {carried_o} "
        f"FROM '{SRC}/orders.parquet'"
        for r in range(REPLICAS)
    )
    con.execute(f"COPY ({union_o}) TO '{OUT}/orders.parquet' (FORMAT PARQUET)")
    cols_p = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/part.parquet'"
        ).fetchall()
    ]
    carried_p = ", ".join(c for c in cols_p if c != "p_partkey")
    union_p = "\nUNION ALL\n".join(
        f"SELECT p_partkey + {r * 1_000_000} AS p_partkey, {carried_p} "
        f"FROM '{SRC}/part.parquet'"
        for r in range(REPLICAS)
    )
    con.execute(f"COPY ({union_p}) TO '{OUT}/part.parquet' (FORMAT PARQUET)")
    for t in ("supplier", "customer", "nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )


N_EVENTS = round(1_000_000 * SF)  # driver law: 100k rows at sf0.1
N_USERS = round(15_000 * SF)  # 1500 users at sf0.1, fixed 30-day span
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
SPAN_LO_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in micros
SPAN_US = 30 * 24 * 3_600_000_000  # the driver's fixed 30-day span
N_VECS = round(2000 * MULT**0.602)  # the driver's ×4-per-decade law
EMBED_DIM = 64


def gen_events(rng: np.random.Generator) -> pa.Table:
    ts_us = np.sort(
        rng.integers(SPAN_LO_US, SPAN_LO_US + SPAN_US, size=N_EVENTS)
    )
    value = np.round(rng.exponential(50.0, size=N_EVENTS), 2)
    ks = rng.integers(0, 100, size=N_EVENTS)
    return pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), type=pa.int64()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, N_USERS, size=N_EVENTS), type=pa.int64()
            ),
            "event_type": pa.array(
                [EVENT_TYPES[i] for i in rng.integers(0, 5, size=N_EVENTS)]
            ),
            "value": pa.array(value, type=pa.float64()),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
        }
    )


def gen_embeddings(rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((N_VECS, EMBED_DIM))
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(N_VECS), type=pa.int64()),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=N_VECS), type=pa.int32()
            ),
        }
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(425)
    pq.write_table(gen_documents(rng), f"{OUT}/documents.parquet")
    pq.write_table(gen_events(rng), f"{OUT}/events.parquet")
    pq.write_table(gen_embeddings(rng), f"{OUT}/embeddings.parquet")
    gen_lineitem(duckdb.connect())
    gen_tpch_side_tables(duckdb.connect())
    con = duckdb.connect()
    docs, uniq = con.execute(
        f"SELECT count(*), count(DISTINCT md5(text)) "
        f"FROM '{OUT}/documents.parquet'"
    ).fetchone()
    li, ords, parts = con.execute(
        f"SELECT count(*), count(DISTINCT l_orderkey), "
        f"count(DISTINCT l_partkey) FROM '{OUT}/lineitem.parquet'"
    ).fetchone()
    print(
        f"documents: {docs} rows ({uniq} distinct texts); "
        f"lineitem: {li} rows, {ords} orders, {parts} parts "
        f"({li / parts:.1f} lineitems/part)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
