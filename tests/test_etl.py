"""End-to-end ETL parity (SURVEY §5.2 item 4): deterministic raw JSON/CSV
fixtures → P1/P2/P3 pipeline → compare against an independent pure-Python
oracle that implements the reference's documented semantics (driver-loop
style: winner-delta times, cumulative points, pit-stop counts).

Fixture edge cases per FIXTURES.md §6: '+5.3' and '+1:02.5' gap rows, a
lapped driver with no Time, missing FastestLap, an empty Races array, a
pitstops file without Races, an empty weather CSV, weather city with no
races, race city with no weather.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from engineering_school_bigdata_project_f1_weather_spark.sources import ergast, weather

CITIES = {
    "Monza": ("Italy", True),       # has weather
    "Spa": ("Belgium", True),       # has weather
    "Zandvoort": ("Netherlands", False),  # race but NO weather (drop path)
}
WEATHER_ONLY_CITY = ("Lisbon", "Portugal")  # weather but no race
DRIVERS = [
    ("max", "Max", "Verstappen", "Red Bull"),
    ("lewis", "Lewis", "Hamilton", "Mercedes"),
    ("charles", "Charles", "Leclerc", "Ferrari"),
    ("lando", "Lando", "Norris", "McLaren"),
]
POINTS = ["25", "18", "15", "12"]


def _results_doc(year: int, rnd: int, empty: bool) -> dict:
    if empty:
        return {"MRData": {"RaceTable": {"Races": []}}}
    results = []
    for i, (did, given, family, cons) in enumerate(DRIVERS):
        res = {
            "Driver": {"driverId": did, "givenName": given, "familyName": family},
            "Constructor": {"name": cons},
            "points": POINTS[i],
            "position": str(i + 1) if i < 3 else "N/A",
            "grid": str(((i + rnd) % 4) + 1),
            "laps": str(50 + i),
            "status": "Finished" if i == 0 else ("+1 Lap" if i == 3 else "Finished"),
        }
        if i == 0:
            res["Time"] = {"time": f"1:3{rnd}:07.98"}          # absolute winner
        elif i == 1:
            res["Time"] = {"time": "+5.3"}                     # seconds gap
        elif i == 2:
            res["Time"] = {"time": "+1:02.5"}                  # M:SS gap
        # i == 3: lapped — no Time key
        if i != 2:                                             # one missing FastestLap
            res["FastestLap"] = {"Time": {"time": f"1:{10 + i + rnd}.5{i}2"}}
        results.append(res)
    return {"MRData": {"RaceTable": {"Races": [{"Results": results}]}}}


def _pitstops_doc(rnd: int, missing: bool) -> dict:
    if missing:
        return {"MRData": {"RaceTable": {}}}
    stops = []
    for i, (did, *_rest) in enumerate(DRIVERS):
        for s in range(i % 3 + 1):  # 1..3 stops
            stops.append(
                {"driverId": did, "stop": str(s + 1), "lap": str(10 * (s + 1)),
                 "time": "14:05:11", "duration": "21.5"}
            )
    return {"MRData": {"RaceTable": {"Races": [{"PitStops": stops}]}}}


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    cities = list(CITIES)
    for year in (2023, 2024):
        for rnd in (1, 2, 3):
            city = cities[(rnd - 1) % len(cities)]
            country = CITIES[city][0]
            date = f"{year}-0{rnd + 3}-1{rnd}"
            (d / f"races_{year}_{rnd}.json").write_text(json.dumps({
                "round": str(rnd), "raceName": f"{city} Grand Prix", "date": date,
                "Circuit": {"circuitId": city.lower(), "circuitName": f"{city} Circuit"},
                "city": city, "country": country,
            }))
            empty = (year == 2024 and rnd == 3)  # one round with no Races
            (d / f"results_{year}_{rnd}.json").write_text(
                json.dumps(_results_doc(year, rnd, empty))
            )
            (d / f"pitstops_{year}_{rnd}.json").write_text(
                json.dumps(_pitstops_doc(rnd, missing=(rnd == 2)))
            )
    # weather CSVs: cities with weather + one weather-only city + one empty file
    header = "date,tavg,tmin,tmax,prcp,snow,wdir,wspd,wpgt,pres,tsun"
    for city, (country, has_weather) in CITIES.items():
        if not has_weather:
            continue
        rows = [header]
        for year in (2023, 2024):
            for rnd in (1, 2, 3):
                date = f"{year}-0{rnd + 3}-1{rnd}"
                rows.append(f"{date},21.5,14.25,27.0,0.0,0.0,180.0,12.5,,1013.0,420.0")
        (d / f"METEO2_data_{city}.csv").write_text("\n".join(rows))
    (d / f"METEO2_data_{WEATHER_ONLY_CITY[0]}.csv").write_text(
        header + "\n2023-04-11,15.0,10.0,20.0,1.25,0.0,90.0,8.0,16.0,1010.0,300.0"
    )
    (d / "METEO2_data_Empty.csv").write_text("")  # skipped (0 rows)
    return str(d)


def _python_oracle(raw_dir: str) -> list[dict]:
    """Independent re-implementation of the reference's normalization
    semantics (SURVEY §2.2/§2.4) in plain Python."""
    def parse_time(t):
        if t is None or t == "N/A":
            return None
        t = t.lstrip("+")
        parts = t.split(":")
        if len(parts) == 1:
            return float(parts[0])
        if len(parts) == 2:
            return float(parts[0]) * 60 + float(parts[1])
        return float(parts[0]) * 3600 + float(parts[1]) * 60 + float(parts[2])

    def format_time(s):
        if s is None:
            return "N/A"
        h = int(s // 3600)
        m = int((s % 3600) // 60)
        return f"{h:02d}:{m:02d}:{s % 60:05.2f}"

    rows = []
    cum: dict[tuple, float] = {}
    for year in (2023, 2024):
        for rnd in (1, 2, 3):
            meta = json.load(open(os.path.join(raw_dir, f"races_{year}_{rnd}.json")))
            res = json.load(open(os.path.join(raw_dir, f"results_{year}_{rnd}.json")))
            pit = json.load(open(os.path.join(raw_dir, f"pitstops_{year}_{rnd}.json")))
            races = res["MRData"]["RaceTable"]["Races"]
            if not races:
                continue
            pit_counts: dict[str, int] = {}
            for race in pit["MRData"]["RaceTable"].get("Races", []):
                for ps in race.get("PitStops", []):
                    pit_counts[ps["driverId"]] = pit_counts.get(ps["driverId"], 0) + 1
            winner_secs = None
            for r in races[0]["Results"]:
                if r.get("position") == "1" and "Time" in r:
                    winner_secs = parse_time(r["Time"]["time"])
            for r in races[0]["Results"]:
                raw_t = r.get("Time", {}).get("time")
                if raw_t is None:
                    abs_s = None
                elif raw_t.startswith("+"):
                    abs_s = winner_secs + parse_time(raw_t)
                else:
                    abs_s = parse_time(raw_t)
                did = r["Driver"]["driverId"]
                pts = float(r["points"])
                cum[(year, did)] = cum.get((year, did), 0.0) + pts
                rows.append(
                    {
                        "year": year,
                        "round": str(rnd),
                        "raceName": meta["raceName"],
                        "circuit": meta["Circuit"]["circuitName"],
                        "city": meta["city"],
                        "country": meta["country"],
                        "date": meta["date"],
                        "driverId": did,
                        "driverFullName": f'{r["Driver"]["givenName"]} {r["Driver"]["familyName"]}',
                        "constructorName": r["Constructor"]["name"],
                        "points": pts,
                        "totalPoints": cum[(year, did)],
                        "position": r.get("position", "N/A"),
                        "grid": r.get("grid", "N/A"),
                        "laps": r.get("laps", "N/A"),
                        "status": r.get("status", "N/A"),
                        "time": format_time(abs_s),
                        "fastestLapTime": r.get("FastestLap", {})
                        .get("Time", {})
                        .get("time", "N/A"),
                        "pitStops": pit_counts.get(did, 0),
                    }
                )
    return rows


def test_p1_normalize_matches_python_oracle(spark, raw_dir):
    got = {
        (r.year, r.round, r.driverId): r.asDict()
        for r in ergast.normalize(spark, raw_dir).collect()
    }
    exp = {(r["year"], r["round"], r["driverId"]): r for r in _python_oracle(raw_dir)}
    assert set(got) == set(exp)
    for key, e in exp.items():
        g = got[key]
        for col, ev in e.items():
            gv = g[col]
            if isinstance(ev, float):
                assert gv is not None and math.isclose(gv, ev), (key, col, gv, ev)
            else:
                assert gv == ev, (key, col, gv, ev)


def test_p2_weather_read(spark, raw_dir):
    stations = spark.createDataFrame(
        [(c, CITIES[c][0]) for c in CITIES if CITIES[c][1]]
        + [WEATHER_ONLY_CITY, ("Empty", "Nowhere")],
        ["city", "country"],
    )
    w = weather.read_weather(spark, raw_dir, stations)
    rows = w.collect()
    # 2 cities × 6 dates + 1 weather-only row; the empty CSV contributes 0
    assert len(rows) == 13
    cities = {r.city for r in rows}
    assert cities == {"Monza", "Spa", "Lisbon"}
    monza = [r for r in rows if r.city == "Monza"][0]
    assert monza.country == "Italy" and monza.tmin == 14.25 and monza.wpgt is None


def test_p3_combine_drop_semantics(spark, raw_dir):
    stations = spark.createDataFrame(
        [(c, CITIES[c][0]) for c in CITIES if CITIES[c][1]] + [WEATHER_ONLY_CITY],
        ["city", "country"],
    )
    f1 = ergast.normalize(spark, raw_dir)
    w = weather.read_weather(spark, raw_dir, stations)
    c = weather.combine(f1, w)
    rows = c.collect()
    # Zandvoort races dropped (no weather); Lisbon weather dropped (no race)
    assert {r.city for r in rows} == {"Monza", "Spa"}
    f1_matched = f1.where(f1.city.isin("Monza", "Spa")).count()
    assert len(rows) == f1_matched
    # weather columns present post-join
    assert rows[0].tavg == 21.5


def test_ergast_python_datasource_connector(spark, raw_dir):  # noqa: F811
    """S1 as a pluggable connector (Spark 4 Python Data Source API): one
    partition per race, raw string-typed rows matching the fixture JSONs,
    parallel across executors."""
    from engineering_school_bigdata_project_f1_weather_spark.sources.ergast_datasource import (
        ErgastDataSource,
    )

    spark.dataSource.register(ErgastDataSource)
    df = spark.read.format("ergast").option("path", raw_dir).load()

    # one partition per results_*.json file
    assert df.rdd.getNumPartitions() == 6

    rows = df.collect()
    oracle = _python_oracle(raw_dir)
    got = {(r.year, r.round, r.driverId) for r in rows}
    exp = {(o["year"], int(o["round"]), o["driverId"]) for o in oracle}
    assert got == exp

    by_key = {(r.year, r.round, r.driverId): r for r in rows}
    for o in oracle:
        r = by_key[(o["year"], int(o["round"]), o["driverId"])]
        assert r.position == o["position"]
        assert r.pitStops == o["pitStops"]
        assert r.city == o["city"]
    # string-typed quirks preserved (normalization happens downstream)
    assert dict(df.dtypes)["position"] == "string"
    assert dict(df.dtypes)["points"] == "string"
