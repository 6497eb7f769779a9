"""Ergast raw zone as a PySpark Python Data Source (S1 as a CONNECTOR).

The reference ingests the Ergast REST API with driver-side ``requests``
loops (`Lucas files/finalversion:60-104`); ``sources/ergast.py`` replaces
that with distributed JSON scans of the raw zone. This module goes one
step further and packages the raw zone as a first-class pluggable source
using the Spark 4 Python Data Source API:

    spark.dataSource.register(ErgastDataSource)
    df = spark.read.format("ergast").option("path", raw_dir).load()

Connector semantics:
- one ``InputPartition`` per race (the `(year, round)` file triple) —
  races read in parallel across executors, which is exactly how a
  REST-paginated ingest parallelizes (one partition per request);
- rows are the RAW flattened results (strings preserved, including the
  reference's ``position``/``points`` string-typed quirks); the
  normalization plan in ``sources/ergast.py`` stays the single place that
  interprets them;
- missing pitstops / empty ``Races`` arrays degrade per-partition, like a
  failed REST page, without killing the scan.

A real REST deployment would swap ``_read_json`` for an HTTP GET per
partition (executor-side, rate-limited); everything else is identical —
which is the point of expressing S1 through the connector API.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ERGAST_SCHEMA = (
    "year INT, round INT, raceName STRING, circuitName STRING, date STRING, "
    "city STRING, country STRING, driverId STRING, givenName STRING, "
    "familyName STRING, constructorName STRING, points STRING, "
    "position STRING, grid STRING, laps STRING, status STRING, "
    "time STRING, fastestLapTime STRING, pitStops INT"
)

_RESULTS_RE = re.compile(r"results_(\d+)_(\d+)\.json$")


class RacePartition(InputPartition):
    def __init__(self, raw_dir: str, year: int, rnd: int):
        self.raw_dir = raw_dir
        self.year = year
        self.rnd = rnd


def _read_json(path: str) -> dict:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _get(d: dict, *keys, default=None):
    for k in keys:
        if not isinstance(d, dict) or k not in d:
            return default
        d = d[k]
    return d


class ErgastReader(DataSourceReader):
    def __init__(self, options: dict):
        self.raw_dir = options.get("path")
        if not self.raw_dir:
            raise ValueError("ergast source requires .option('path', raw_dir)")

    def partitions(self) -> Sequence[RacePartition]:
        parts = []
        for f in sorted(os.listdir(self.raw_dir)):
            m = _RESULTS_RE.match(f)
            if m:
                parts.append(
                    RacePartition(self.raw_dir, int(m.group(1)), int(m.group(2)))
                )
        return parts

    def read(self, part: RacePartition) -> Iterator[tuple]:
        base = part.raw_dir
        meta = _read_json(os.path.join(base, f"races_{part.year}_{part.rnd}.json"))
        res = _read_json(os.path.join(base, f"results_{part.year}_{part.rnd}.json"))
        pit = _read_json(os.path.join(base, f"pitstops_{part.year}_{part.rnd}.json"))

        pit_counts: dict[str, int] = {}
        for race in _get(pit, "MRData", "RaceTable", "Races", default=[]) or []:
            for stop in race.get("PitStops") or []:
                d = stop.get("driverId")
                if d:
                    pit_counts[d] = pit_counts.get(d, 0) + 1

        races = _get(res, "MRData", "RaceTable", "Races", default=[]) or []
        for race in races:
            for r in race.get("Results") or []:
                driver = r.get("Driver") or {}
                yield (
                    part.year,
                    part.rnd,
                    meta.get("raceName"),
                    _get(meta, "Circuit", "circuitName"),
                    meta.get("date"),
                    meta.get("city"),
                    meta.get("country"),
                    driver.get("driverId"),
                    driver.get("givenName"),
                    driver.get("familyName"),
                    _get(r, "Constructor", "name"),
                    r.get("points"),
                    r.get("position"),
                    r.get("grid"),
                    r.get("laps"),
                    r.get("status"),
                    _get(r, "Time", "time"),
                    _get(r, "FastestLap", "Time", "time"),
                    pit_counts.get(driver.get("driverId"), 0),
                )


class ErgastDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ergast"

    def schema(self) -> str:
        return ERGAST_SCHEMA

    def reader(self, schema) -> ErgastReader:
        return ErgastReader(self.options)
