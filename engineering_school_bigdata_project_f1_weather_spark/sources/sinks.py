"""Sinks: the lake-writing side of the pipeline (SURVEY §2.1 S6-S9).

- ``write_parquet``    : zone writer. The reference coalesced every output
  to one file (`finalversion:192,272,292` — quirk 9, an anti-scale choice
  that serializes the final stage); here natural partitioning is the
  default and ``compat_single_file=True`` opts into the byte-layout-
  compatible single file.
- ``write_mart``       : usage-zone writer with the reference's mart names.
  Fixes quirk 7 (`finalversion:389` writes the *filter* mart into the
  fastest-lap folder) behind ``preserve_path_bug``.
- ``csv_to_parquet``   : P6 utility (`finalversion:274-281`).
- ``foreach_partition_sink``: the S8/S9 Elasticsearch-shaped sink as a
  partition-parallel callback (HTTP clients per partition, never through
  the driver). The reference's ES bulk loader read marts into pandas on one
  machine; this shape ships each partition independently.

Lake layout (SURVEY §1.1): ``<zone>/<dataset>/<YYYYMMDD>/`` date-partitioned
directories; at scale ``partitionBy`` gives Hive-style partition pruning.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

MART_NAMES = [
    "wins", "fastestlap", "filter", "weather2324",
    "evopoints", "constructor", "pitstop", "stats", "top10",
]


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compat_single_file: bool = False,
) -> None:
    w = df.coalesce(1).write if compat_single_file else df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(path)


def mart_path(usage_dir: str, name: str, preserve_path_bug: bool = False) -> str:
    """Usage-zone path for a mart. quirk 7: the reference wrote the filter
    mart under analysis_2 (fastest lap) because FILTER_OUTPUT_FOLDER went
    unused; ``preserve_path_bug=True`` reproduces that mapping."""
    idx = MART_NAMES.index(name) + 1
    if preserve_path_bug and name == "filter":
        idx = MART_NAMES.index("fastestlap") + 1
    return f"{usage_dir}/analysis_{idx}/{name}.parquet"


def write_mart(
    df: DataFrame,
    usage_dir: str,
    name: str,
    compat_single_file: bool = False,
    preserve_path_bug: bool = False,
) -> str:
    path = mart_path(usage_dir, name, preserve_path_bug)
    write_parquet(df, path, compat_single_file=compat_single_file)
    return path


def csv_to_parquet(
    spark: SparkSession, csv_path: str, parquet_path: str, schema=None
) -> None:
    """P6: CSV→parquet conversion utility (`finalversion:274-281`) — with an
    explicit schema instead of inference when one is supplied."""
    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema is not None else reader.option(
        "inferSchema", True
    )
    reader.csv(csv_path).write.mode("overwrite").parquet(parquet_path)


def serving_prep(df: DataFrame, drop_cols: tuple[str, ...] = ("best_lap_time",), fill=0) -> DataFrame:
    """Pre-serving cleanup (T10/T11, `Martin files/elsastic parquet.py:22,26`):
    null-fill then drop the columns the serving layer excludes."""
    return df.na.fill(fill).drop(*drop_cols)


# S10 (Kibana saved objects): the reference posts hand-written JSON bodies
# to /api/saved_objects (`Martin files/create_index_pattern.py:10-15`,
# `create_visualization.py:10-27`, `create_dashboard.py:14-97`). The HTTP
# POST is serving-infra (out of engine scope per SURVEY §7.4); the part a
# data engine owns — deriving each body's metadata (index title, time
# field, field list + ES types) from the mart itself — is implemented here.

_ES_TYPES = {  # Spark simpleString → Elasticsearch field type
    "bigint": "long", "int": "integer", "double": "double",
    "float": "float", "string": "keyword", "boolean": "boolean",
    "date": "date", "timestamp": "date",
}


def serving_manifest(
    marts: dict[str, DataFrame], usage_dir: str, time_field: str | None = None
) -> list[dict[str, Any]]:
    """Per-mart serving metadata: everything the reference's saved-object
    scripts hard-code by hand (title, timeFieldName, per-field ES types),
    derived from the mart DataFrames. Pure metadata — ``df.schema`` plus one
    ``count()`` per mart; no data moves through the driver."""
    out = []
    for name, df in marts.items():
        fields = [
            {"name": f.name, "es_type": _ES_TYPES.get(f.dataType.simpleString(), "keyword")}
            for f in df.schema.fields
        ]
        entry = {
            "mart": name,
            "path": mart_path(usage_dir, name),
            "index_title": f"f1_{name}",
            "row_count": df.count(),
            "fields": fields,
        }
        if time_field is not None and any(f["name"] == time_field for f in fields):
            entry["time_field"] = time_field
        out.append(entry)
    return out


def index_pattern_saved_object(entry: dict[str, Any]) -> dict[str, Any]:
    """Kibana index-pattern saved-object body for one manifest entry —
    same shape as `create_index_pattern.py:10-15`, minus the hand-coding."""
    attrs: dict[str, Any] = {"title": entry["index_title"]}
    if "time_field" in entry:
        attrs["timeFieldName"] = entry["time_field"]
    return {"attributes": attrs}


def visualization_saved_object(
    entry: dict[str, Any], field: str, viz_type: str = "pie", size: int = 5
) -> dict[str, Any]:
    """Kibana visualization saved-object body (terms-agg over ``field``) —
    the `create_visualization.py:10-27` shape with the field validated
    against the manifest instead of typo-prone hand-writing."""
    import json as _json

    names = {f["name"]: f["es_type"] for f in entry["fields"]}
    if field not in names:
        raise KeyError(f"{field!r} not in mart {entry['mart']!r} fields {sorted(names)}")
    # keyword fields are aggregated via the .keyword sub-field, as the
    # reference does for raceName.
    agg_field = f"{field}.keyword" if names[field] == "keyword" else field
    title = f"{entry['mart']}: {field} {viz_type}"
    return {
        "attributes": {
            "title": title,
            "visState": _json.dumps({
                "title": title,
                "type": viz_type,
                "params": {"addTooltip": True, "addLegend": True, "isDonut": False},
                "aggs": [
                    {"id": "1", "enabled": True, "type": "count",
                     "schema": "metric", "params": {}},
                    {"id": "2", "enabled": True, "type": "terms",
                     "schema": "segment",
                     "params": {"field": agg_field, "size": size, "order": "desc"}},
                ],
            }),
            "uiStateJSON": "{}",
            "description": "",
            "version": 1,
            "kibanaSavedObjectMeta": {
                "searchSourceJSON": _json.dumps({
                    "index": entry["index_title"],
                    "query": {"language": "kuery", "query": ""},
                    "filter": [],
                })
            },
        }
    }


def dashboard_saved_object(
    title: str,
    panel_ids: list[str],
    version: str = "7.3.0",
) -> dict[str, Any]:
    """Kibana dashboard saved-object body (the panelsJSON container) —
    the `Martin files/create_dashboard.py:14-97` shape. The reference
    creates an empty dashboard then PUTs a single hand-written panel;
    here the container is derived in one step from the visualization
    saved-object ids, laid out on Kibana's 48-unit grid two panels per
    row (each panel the reference's 24x15 size).

    The returned body is what the serving layer POSTs to
    ``/api/saved_objects/dashboard`` — the HTTP call itself stays
    serving-infra, exactly as for the index-pattern/visualization bodies
    above."""
    import json as _json

    panels = []
    for i, viz_id in enumerate(panel_ids):
        panels.append({
            "embeddableConfig": {},
            "gridData": {
                "h": 15,
                "i": str(i + 1),
                "w": 24,
                "x": 24 * (i % 2),
                "y": 15 * (i // 2),
            },
            "id": viz_id,
            "panelIndex": str(i + 1),
            "type": "visualization",
            "version": version,
        })
    return {
        "attributes": {
            "title": title,
            "hits": 0,
            "description": "",
            "panelsJSON": _json.dumps(panels),
            "optionsJSON": _json.dumps(
                {"useMargins": True, "hidePanelTitles": False}
            ),
            "version": 1,
            "timeRestore": False,
            "kibanaSavedObjectMeta": {
                "searchSourceJSON": _json.dumps(
                    {"filter": [], "query": {"language": "kuery", "query": ""}}
                )
            },
        }
    }


def publish_saved_objects(
    base_url: str,
    objects: list[tuple[str, str | None, dict[str, Any]]],
    attempts: int = 3,
) -> list[dict[str, Any]]:
    """POST the saved-object bodies built above to a live Kibana
    (round 7 — the reference's `create_index_pattern.py` /
    `create_visualization.py` / `create_dashboard.py` REST calls, with
    retries and idempotent republish).

    ``objects`` is ``[(type, id_or_None, body), …]`` — e.g.
    ``("index-pattern", "f1_wins", index_pattern_saved_object(e))``.
    Each POSTs to ``{base}/api/saved_objects/{type}[/{id}]?overwrite=true``
    with the ``kbn-xsrf`` header Kibana requires; ``overwrite=true``
    plus caller-chosen ids makes republishing a dashboard a no-op
    update instead of a duplicate (the idempotency the reference's
    scripts lack).  Saved objects are metadata-sized (one body per
    mart/panel), so this is correctly DRIVER-side — the data path
    stays the esbulk executor sink.  Returns the parsed responses.
    Exercised against a live in-process server in
    tests/test_survey_coverage.py::test_s10_kibana_http_publish."""
    import json as _json
    import time as _time
    import urllib.request

    out = []
    for obj_type, obj_id, body in objects:
        url = f"{base_url.rstrip('/')}/api/saved_objects/{obj_type}"
        if obj_id:
            url += f"/{obj_id}"
        url += "?overwrite=true"
        payload = _json.dumps(body).encode()
        last: Exception | None = None
        for i in range(attempts):
            try:
                req = urllib.request.Request(
                    url,
                    data=payload,
                    method="POST",
                    headers={
                        "Content-Type": "application/json",
                        "kbn-xsrf": "true",
                    },
                )
                with urllib.request.urlopen(req, timeout=30) as resp:
                    out.append(_json.loads(resp.read() or b"{}"))
                break
            except Exception as e:  # noqa: BLE001 — retried, re-raised below
                last = e
                _time.sleep(0.2 * (2**i))
        else:
            raise RuntimeError(
                f"saved-object POST {url} failed after {attempts} attempts: {last}"
            )
    return out


def foreach_partition_sink(
    df: DataFrame, send: Callable[[Iterator[dict[str, Any]]], None]
) -> None:
    """S8-shaped serving sink: ``send`` receives each partition's rows as
    dicts (e.g. an Elasticsearch ``helpers.bulk`` call per partition).
    Executor-side and partition-parallel — the driver never materializes
    the mart (unlike `Code Big Data Project.py:405-454`)."""
    df.foreachPartition(lambda rows: send(r.asDict() for r in rows))
