"""Coverage pins for the remaining SURVEY §2 inventory items: U1/T5
(per-city union with literal tagging), T10/T11 (serving prep), S8
(partition-parallel serving sink), and FIXTURES.md §5 golden mart schemas."""

from __future__ import annotations

import glob
import json
import os

import pyspark.sql.functions as F
import pytest

from engineering_school_bigdata_project_f1_weather_spark.operators import marts
from engineering_school_bigdata_project_f1_weather_spark.sources import weather as weather_src
from engineering_school_bigdata_project_f1_weather_spark.sources.sinks import (
    foreach_partition_sink,
    serving_prep,
)
from engineering_school_bigdata_project_f1_weather_spark.sources.weather import (
    WEATHER_CSV_SCHEMA,
)

from tests.test_etl import CITIES, WEATHER_ONLY_CITY, raw_dir  # noqa: F401


def test_u1_union_with_lit_tagging_matches_glob_scan(spark, raw_dir):  # noqa: F811
    """U1 + T5: the reference's per-city read + lit(city)/lit(country) +
    iterative union (`finalversion:253-272`) produces the same table as the
    engine's single glob scan + dim join."""
    frames = []
    for path in sorted(glob.glob(f"{raw_dir}/METEO2_data_*.csv")):
        city = os.path.basename(path)[len("METEO2_data_"):-len(".csv")]
        country = dict([WEATHER_ONLY_CITY]).get(city) or CITIES.get(city, (None,))[0]
        df = (
            spark.read.schema(WEATHER_CSV_SCHEMA)
            .option("header", True)
            .csv(path)
            .withColumn("country", F.lit(country))
            .withColumn("city", F.lit(city))
        )
        frames.append(df)
    unioned = weather_src.union_cities(frames)

    stations = spark.createDataFrame(
        [(c, CITIES[c][0]) for c in CITIES if CITIES[c][1]]
        + [WEATHER_ONLY_CITY, ("Empty", None)],
        ["city", "country"],
    )
    scanned = weather_src.read_weather(spark, raw_dir, stations)
    assert sorted(unioned.columns) == sorted(scanned.columns)
    a = {tuple(r) for r in unioned.select(*sorted(unioned.columns)).collect()}
    b = {tuple(r) for r in scanned.select(*sorted(scanned.columns)).collect()}
    assert a == b


def test_t10_t11_serving_prep(spark):
    df = spark.createDataFrame(
        [(1, None, "x"), (2, 3.5, None)], ["id", "best_lap_time", "note"]
    )
    out = serving_prep(df.withColumn("val", F.lit(None).cast("double")), fill=0)
    assert "best_lap_time" not in out.columns
    rows = {r.id: r for r in out.collect()}
    assert rows[1].val == 0.0  # numeric nulls filled before drop


def test_s8_foreach_partition_sink(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out_dir = str(tmp_path / "sink")
    os.makedirs(out_dir, exist_ok=True)

    def send(rows):
        import os as _os
        import uuid

        recs = list(rows)
        if recs:
            p = _os.path.join(out_dir, f"part-{uuid.uuid4().hex}.json")
            with open(p, "w") as f:
                json.dump(recs, f)

    foreach_partition_sink(df, send)
    got = []
    for p in glob.glob(f"{out_dir}/part-*.json"):
        got.extend(json.load(open(p)))
    assert len(got) == 100
    assert {r["id"] for r in got} == set(range(100))
    assert all(r["v"] == r["id"] * 2 for r in got)


# FIXTURES.md §5 — golden output schemas from the reference's committed
# parquets (`Martin files/index/*.parquet`).
GOLDEN_SCHEMAS = {
    "q1_wins": [("driverFullName", "string"), ("year", "bigint"),
                ("city", "string"), ("wins", "bigint")],
    "q2_fastestlap": [("year", "bigint"), ("circuit", "string"), ("city", "string"),
                      ("driverFullName", "string"), ("fastestLapTime", "string")],
    "q3_filter": [("year", "bigint"), ("city", "string"), ("driverFullName", "string")],
    "q4_weather": [("year", "bigint"), ("city", "string"), ("driverFullName", "string"),
                   ("temp_min", "double"), ("temp_max", "double"), ("temp_avg", "double"),
                   ("precipitation", "double"), ("wspd", "double")],
    "q5_evopoints": [("year", "bigint"), ("date", "string"), ("driverFullName", "string"),
                     ("totalPoints", "double"), ("city", "string")],
    "q6_constructor": [("year", "bigint"), ("date", "string"), ("driverFullName", "string"),
                       ("ConstructorName", "string"), ("totalPoints", "double"),
                       ("city", "string")],
    "q7_pitstops": [("year", "bigint"), ("date", "string"), ("driverFullName", "string"),
                    ("pitStops", "bigint"), ("city", "string")],
    "q8_circuit_stats": [("circuit", "string"), ("avg_laps", "double"),
                         ("best_lap_time", "string"), ("total_races", "bigint")],
    "q9_top10": [("driverFullName", "string"), ("circuit", "string"),
                 ("fastestLapTime", "string")],
}


@pytest.mark.parametrize("name", sorted(GOLDEN_SCHEMAS))
def test_golden_mart_schema(name, spark, sf_dir):
    df = getattr(marts, name)(spark, sf_dir)
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == GOLDEN_SCHEMAS[name]


# VERDICT r1 item 2: pin parity against the reference's ACTUAL committed
# golden parquets (`Martin files/index/*.parquet`, SURVEY §5.1), not just
# the FIXTURES.md transcription — a drifted transcription now fails here.
# (query name, reference file, expected rows per SURVEY §1.2)
REFERENCE_GOLDENS = [
    ("q1_wins", "wins.parquet", 51),
    ("q2_fastestlap", "fastestlap.parquet", 50),
    ("q3_filter", "filter.parquet", 1019),
    ("q4_weather", "weather2324.parquet", 579),
    ("q5_evopoints", "evopoints.parquet", 1019),
    ("q6_constructor", "constructor.parquet", 1019),
    ("q7_pitstops", "pitstop.parquet", 1019),
]

REFERENCE_INDEX_DIR = "/root/reference/Martin files/index"

# Arrow physical type → Spark simpleString for the types these marts use.
_ARROW_TO_SPARK = {"int64": "bigint", "string": "string",
                   "large_string": "string", "double": "double"}


@pytest.mark.parametrize(
    "name,fname,nrows", REFERENCE_GOLDENS, ids=[g[0] for g in REFERENCE_GOLDENS]
)
def test_reference_golden_parquets(name, fname, nrows):
    """Read the reference's golden parquet; assert FIXTURES.md §5 /
    GOLDEN_SCHEMAS matches its real schema and SURVEY §1.2 its row count."""
    import pyarrow.parquet as pq

    path = os.path.join(REFERENCE_INDEX_DIR, fname)
    if not os.path.exists(path):
        pytest.skip("reference goldens not mounted")
    md = pq.read_metadata(path)
    assert md.num_rows == nrows, f"{fname}: rows {md.num_rows} != {nrows}"
    schema = pq.read_schema(path)
    got = [
        (schema.field(i).name, _ARROW_TO_SPARK[str(schema.field(i).type)])
        for i in range(len(schema))
    ]
    assert got == GOLDEN_SCHEMAS[name], (
        f"FIXTURES.md drifted from {fname}: {got} != {GOLDEN_SCHEMAS[name]}"
    )


def test_s10_serving_manifest_and_saved_objects(spark, sf_dir):
    """S10: the saved-object metadata the reference hand-codes
    (`create_index_pattern.py:10-15`, `create_visualization.py:10-27`)
    is derived from the marts themselves."""
    from engineering_school_bigdata_project_f1_weather_spark.sources.sinks import (
        index_pattern_saved_object,
        serving_manifest,
        visualization_saved_object,
    )

    wins = marts.q1_wins(spark, sf_dir)
    man = serving_manifest({"wins": wins}, "/tmp/usage")
    assert len(man) == 1
    e = man[0]
    assert e["index_title"] == "f1_wins"
    assert e["path"].endswith("analysis_1/wins.parquet")
    assert e["row_count"] == wins.count()
    assert {f["name"]: f["es_type"] for f in e["fields"]} == {
        "driverFullName": "keyword", "year": "long",
        "city": "keyword", "wins": "long",
    }

    ip = index_pattern_saved_object(e)
    assert ip == {"attributes": {"title": "f1_wins"}}

    viz = visualization_saved_object(e, "driverFullName")
    state = json.loads(viz["attributes"]["visState"])
    assert state["aggs"][1]["params"]["field"] == "driverFullName.keyword"
    meta = json.loads(viz["attributes"]["kibanaSavedObjectMeta"]["searchSourceJSON"])
    assert meta["index"] == "f1_wins"
    with pytest.raises(KeyError):
        visualization_saved_object(e, "nope")


def test_s10_dashboard_saved_object():
    """S10 completion (VERDICT r2 item 7): the dashboard container body
    (`create_dashboard.py:14-97`) — panelsJSON referencing every mart
    panel, reference-shaped attributes, non-overlapping 48-unit grid."""
    from engineering_school_bigdata_project_f1_weather_spark.sources.sinks import (
        dashboard_saved_object,
    )

    viz_ids = [f"viz-{name}" for name in
               ["wins", "fastestlap", "filter", "weather2324",
                "evopoints", "constructor", "pitstop"]]
    body = dashboard_saved_object("F1 Weather Dashboard", viz_ids)

    attrs = body["attributes"]
    # reference-shaped container attributes (create_dashboard.py:55-88)
    assert attrs["title"] == "F1 Weather Dashboard"
    assert attrs["hits"] == 0 and attrs["timeRestore"] is False
    assert json.loads(attrs["optionsJSON"]) == {
        "useMargins": True, "hidePanelTitles": False,
    }
    meta = json.loads(attrs["kibanaSavedObjectMeta"]["searchSourceJSON"])
    assert meta == {"filter": [], "query": {"language": "kuery", "query": ""}}

    panels = json.loads(attrs["panelsJSON"])
    assert [p["id"] for p in panels] == viz_ids  # all 7 marts referenced
    assert all(p["type"] == "visualization" for p in panels)
    # each panel is the reference's 24x15 size, and no two overlap on the
    # 48-unit-wide grid (two per row)
    cells = set()
    for p in panels:
        g = p["gridData"]
        assert (g["w"], g["h"]) == (24, 15)
        assert g["x"] in (0, 24) and g["x"] + g["w"] <= 48
        assert (g["x"], g["y"]) not in cells
        cells.add((g["x"], g["y"]))
    assert [p["panelIndex"] for p in panels] == [str(i + 1) for i in range(7)]


def test_s8_esbulk_writer_datasource(spark, sf_dir, tmp_path):
    """S8/S9 as a pluggable WRITER connector: partition-parallel bulk-body
    staging, all-or-nothing publish on commit, NDJSON action/doc pairs."""
    import json
    import os

    from engineering_school_bigdata_project_f1_weather_spark.operators.marts import q1_wins
    from engineering_school_bigdata_project_f1_weather_spark.sources.esbulk_datasource import (
        EsBulkDataSource,
    )

    spark.dataSource.register(EsBulkDataSource)
    out = str(tmp_path / "esbulk")
    df = q1_wins(spark, sf_dir)
    n = df.count()
    df.write.format("esbulk").option("path", out).option(
        "index", "f1_wins"
    ).mode("append").save()

    files = sorted(f for f in os.listdir(out) if f.endswith(".ndjson"))
    assert files
    docs = 0
    for fn in files:
        lines = open(os.path.join(out, fn)).read().splitlines()
        assert len(lines) % 2 == 0
        for i in range(0, len(lines), 2):
            action = json.loads(lines[i])
            assert action == {"index": {"_index": "f1_wins"}}
            json.loads(lines[i + 1])  # source doc parses
        docs += len(lines) // 2
    assert docs == n

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["n_docs"] == n
    assert sum(e["n_docs"] for e in manifest["files"]) == n
    # no staged leftovers after a clean commit
    assert not os.path.exists(os.path.join(out, "_staging")) or not os.listdir(
        os.path.join(out, "_staging")
    )

    # append again: a second job must ADD its docs, never clobber the
    # first job's committed parts (per-job-unique published names)
    df.write.format("esbulk").option("path", out).option(
        "index", "f1_wins"
    ).mode("append").save()
    manifest2 = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest2["n_docs"] == 2 * n
    assert len({e["file"] for e in manifest2["files"]}) == len(manifest2["files"])

    # overwrite republish: prior bodies replaced only on successful commit
    df.write.format("esbulk").option("path", out).option(
        "index", "f1_wins"
    ).mode("overwrite").save()
    manifest3 = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest3["n_docs"] == n
    ndjson_docs = 0
    for fn in os.listdir(out):
        if fn.endswith(".ndjson"):
            ndjson_docs += len(open(os.path.join(out, fn)).read().splitlines()) // 2
    assert ndjson_docs == n


def test_s8_esbulk_abort_leaves_prior_state_intact(spark, tmp_path):
    """Exactly-once proof for the esbulk writer (VERDICT r3 item 7): a
    task failing mid-job must abort the whole write with NO committed
    parts and an unchanged manifest — for BOTH append and overwrite —
    because commit() is the only place published state changes and it
    runs only after every partition succeeded."""
    import json
    import os

    import pyspark.sql.functions as F
    import pytest
    from pyspark.sql.types import LongType

    from engineering_school_bigdata_project_f1_weather_spark.sources.esbulk_datasource import (
        EsBulkDataSource,
    )

    spark.dataSource.register(EsBulkDataSource)
    out = str(tmp_path / "esbulk_abort")

    good = spark.range(0, 40, 1, 4).select(F.col("id").alias("doc"))
    good.write.format("esbulk").option("path", out).option(
        "index", "idx"
    ).mode("append").save()

    def snapshot():
        parts = sorted(
            f for f in os.listdir(out) if f.endswith(".ndjson")
        )
        manifest = open(os.path.join(out, "_MANIFEST.json")).read()
        return parts, manifest

    before = snapshot()
    assert before[0]  # something was committed

    # Poison ONE of the 4 partitions: the write(iterator) for it raises
    # while other partitions stage successfully.
    @F.udf(LongType())
    def poison(v):
        if v == 57:
            raise ValueError("poisoned row")
        return v

    bad = spark.range(40, 80, 1, 4).select(poison(F.col("id")).alias("doc"))
    for mode in ("append", "overwrite"):
        with pytest.raises(Exception):
            bad.write.format("esbulk").option("path", out).option(
                "index", "idx"
            ).mode(mode).save()
        assert snapshot() == before, f"{mode}: published state changed"
    # staged leftovers from the failed attempts may exist only under
    # _staging (abort removes what it was told about; stray uuid files
    # are harmless by design) — but nothing published, manifest intact.


def test_dedup_keep_best_one_keeper_per_component(spark, sf_dir):
    """Keeper selection invariants: every document appears exactly once,
    every component keeps exactly ONE member, and the keeper's quality
    score is the component maximum (min doc_id on ties)."""
    import pyspark.sql.functions as F

    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup

    out = dedup.dedup_keep_best(spark, sf_dir).cache()
    n_docs = out.count()
    assert out.select("doc_id").distinct().count() == n_docs

    per_comp = out.groupBy("component").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.max("score").alias("max_score"),
    )
    assert per_comp.where(F.col("n_keep") != 1).count() == 0

    keepers = out.where("keep").select("component", "score")
    bad = keepers.join(per_comp, "component").where(
        F.col("score") != F.col("max_score")
    )
    assert bad.count() == 0
    out.unpersist()


def test_sim_knn_graph_ranks_and_topk_consistency(spark, sf_dir):
    """kNN-graph invariants: ranks are 1..DEGREE dense per vector with
    sims non-increasing, and each vector's top-1 neighbor sim can never
    beat the brute-force top-1 (candidates are a subset of all pairs)."""
    import pyspark.sql.functions as F

    from engineering_school_bigdata_project_f1_weather_spark.operators import similarity

    g = similarity.sim_knn_graph(spark, sf_dir).cache()
    assert g.where(
        (F.col("rank") < 1) | (F.col("rank") > similarity.KNN_GRAPH_DEGREE)
    ).count() == 0
    # dense ranks: per vec_id, max(rank) == count(rank)
    per_vec = g.groupBy("vec_id").agg(
        F.max("rank").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    assert per_vec.where(F.col("mx") != F.col("n")).count() == 0
    # no self-edges, no duplicate neighbor per vector
    assert g.where(F.col("vec_id") == F.col("nbr_id")).count() == 0
    assert g.groupBy("vec_id", "nbr_id").count().where("count > 1").count() == 0

    # top-1 of the graph <= brute-force top-1 (sim_topk strides queries;
    # compare on the overlap)
    top1 = g.where(F.col("rank") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("sim_e6").alias("g_sim")
    )
    brute = similarity.sim_topk(spark, sf_dir).where(F.col("rank") == 1)
    joined = brute.join(top1, "query_id")
    assert joined.where(F.col("g_sim") > F.col("sim_e6")).count() == 0
    g.unpersist()


def test_s8_esbulk_http_mode(spark, sf_dir, tmp_path):
    """S8 HTTP mode (round 7): the esbulk writer POSTs real bulk bodies
    over HTTP from the executors — exercised end-to-end against a live
    in-process HTTP server.  Pins: (a) every row arrives exactly once by
    deterministic _id (a transient 503 on the first POST forces the
    retry path, and the idempotent ids make the re-POST harmless);
    (b) bulk NDJSON framing (action line with _index/_id + source line);
    (c) the audit manifest records the shipped doc count."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from engineering_school_bigdata_project_f1_weather_spark.operators.marts import (
        q1_wins,
    )
    from engineering_school_bigdata_project_f1_weather_spark.sources.esbulk_datasource import (
        EsBulkDataSource,
    )

    received: dict[str, dict] = {}
    failed_once = threading.Event()
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            # transient failure on the very first POST → retry path
            if not failed_once.is_set():
                failed_once.set()
                self.send_response(503)
                self.end_headers()
                return
            lines = body.decode().splitlines()
            with lock:
                for i in range(0, len(lines), 2):
                    action = json.loads(lines[i])["index"]
                    assert action["_index"] == "f1_wins_http"
                    received[action["_id"]] = json.loads(lines[i + 1])
            resp = json.dumps({"errors": False, "items": []}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        spark.dataSource.register(EsBulkDataSource)
        out = str(tmp_path / "esbulk_http")
        df = q1_wins(spark, sf_dir)
        rows = {
            tuple(sorted(r.asDict().items())) for r in df.collect()
        }
        df.write.format("esbulk").option("path", out).option(
            "index", "f1_wins_http"
        ).option("url", url).option("batch_docs", "7").mode("append").save()

        assert failed_once.is_set()  # the retry path actually ran
        got = {
            tuple(sorted((k, str(v)) for k, v in doc.items()))
            for doc in received.values()
        }
        want = {
            tuple(sorted((k, str(v)) for k, v in dict(r).items()))
            for r in rows
        }
        assert got == want and len(received) == len(rows)

        manifest = json.load(open(f"{out}/_MANIFEST.json"))
        assert manifest["mode"] == "http"
        assert manifest["n_docs"] == len(rows)

        # re-shipping the same mart is absorbed by the deterministic ids
        df.write.format("esbulk").option("path", out).option(
            "index", "f1_wins_http"
        ).option("url", url).mode("append").save()
        assert len(received) == len(rows)
    finally:
        srv.shutdown()


def test_s10_kibana_http_publish(spark, sf_dir, tmp_path):
    """S10 HTTP publish (round 7): the Kibana saved-object bodies ship
    to a live in-process server via publish_saved_objects — pins the
    REST contract (per-type routes, id in path, overwrite=true, kbn-xsrf
    header), retry on transient failure, and idempotent republish
    (same ids + overwrite → an update, not a duplicate)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from engineering_school_bigdata_project_f1_weather_spark.operators.marts import (
        q1_wins,
    )
    from engineering_school_bigdata_project_f1_weather_spark.sources import sinks

    store: dict[tuple[str, str], dict] = {}
    failed_once = threading.Event()
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            assert self.headers["kbn-xsrf"] == "true"
            path, _, query = self.path.partition("?")
            assert query == "overwrite=true"
            parts = path.split("/")  # /api/saved_objects/<type>[/<id>]
            obj_type = parts[3]
            obj_id = parts[4] if len(parts) > 4 else f"auto-{len(store)}"
            if not failed_once.is_set():
                failed_once.set()
                self.send_response(503)
                self.end_headers()
                return
            with lock:
                store[(obj_type, obj_id)] = body
            resp = json.dumps({"id": obj_id, "type": obj_type}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        marts = {"wins": q1_wins(spark, sf_dir)}
        manifest = sinks.serving_manifest(marts, str(tmp_path / "usage"))
        entry = manifest[0]
        viz = sinks.visualization_saved_object(entry, "driverFullName")
        dash = sinks.dashboard_saved_object("f1 dashboard", ["viz-wins"])
        objects = [
            ("index-pattern", entry["index_title"], sinks.index_pattern_saved_object(entry)),
            ("visualization", "viz-wins", viz),
            ("dashboard", "dash-f1", dash),
        ]
        responses = sinks.publish_saved_objects(url, objects)
        assert failed_once.is_set()  # retry path ran
        assert [r["id"] for r in responses] == [
            entry["index_title"], "viz-wins", "dash-f1"
        ]
        assert store[("index-pattern", entry["index_title"])]["attributes"][
            "title"
        ] == entry["index_title"]
        panels = json.loads(
            store[("dashboard", "dash-f1")]["attributes"]["panelsJSON"]
        )
        assert [p["id"] for p in panels] == ["viz-wins"]
        # idempotent republish: same ids, overwrite → still 3 objects
        sinks.publish_saved_objects(url, objects)
        assert len(store) == 3
    finally:
        srv.shutdown()
