"""Pin the EDjoin location-filter crossover (round 11, VERDICT r10 #5).

The trade: Spark's banded ``levenshtein(a, b, tau)`` verify costs
O(tau * len) PER candidate pair, while the location filter's occurrence
join + interval packing costs ~constant per pair (it touches prefix
occurrences, never the strings). Round 10 measured the filter a 2.5x
net LOSS on the fixture's ~300-char docs; this probe measures BOTH
paths on the same candidate topology at increasing doc lengths, so the
auto-enable threshold (dedup.EDIT_FILTER_MIN_AVG_CHARS) is a pinned
number, not prose.

Corpus shape per length L: C template families of G docs each — every
same-family pair is a prefix-join candidate (they share most rare
grams), but only the planted near-dup pairs are within tau; the rest
carry ~L/20 scattered substitutions and exist to be KILLED, by the
verify (direct path) or by the filter (filtered path). Everything is
md5-derived — deterministic, no RNG state.

Usage: python tools/edit_crossover_probe.py [L ...]   (default 300 2000 4000)
Prints one JSON line per L: direct vs filtered wall (median of 3,
1 warm), candidate count, and the verified-pair count (asserted equal
across paths).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEMPLATES = int(os.environ.get("SPARK_GRAFT_XOVER_TPL", "4"))
DOCS_PER_TEMPLATE = int(os.environ.get("SPARK_GRAFT_XOVER_DOCS", "150"))
DUPS_PER_TEMPLATE = 3  # docs within tau of member 0

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _chars(seed: str, n: int) -> str:
    out = []
    i = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.extend(ALPHA[int(c, 16) % 26] for c in h)
        i += 1
    return "".join(out[:n])


def _mutate(base: str, seed: str, n_edits: int, slots: list[int]) -> str:
    """Substitutions at hash-chosen SLOTS from a shared per-template
    pool, chars from a binary alphabet — so different docs' mutated
    q-gram windows COLLIDE (df well above 1 but far below the template
    grams' df), which is what puts them in each other's rarest-gram
    prefix and makes every same-template pair a prefix-join candidate.
    Independent per-slot hashes keep it deterministic."""
    s = list(base)
    for j in range(n_edits):
        h = hashlib.md5(f"{seed}:e{j}".encode()).hexdigest()
        pos = slots[int(h[:8], 16) % len(slots)]
        s[pos] = "ab"[int(h[8], 16) % 2]
    return "".join(s)


def build_corpus(length: int) -> list[tuple[int, str]]:
    """LENGTH-INDEPENDENT candidate topology: a fixed 48-slot pool and a
    fixed 24 substitutions per far doc, so the candidate count is ~the
    same at every length and the direct-vs-filtered comparison isolates
    the per-pair verify cost's O(len) growth."""
    rows = []
    did = 0
    far = 24
    n_slots = 48
    # Slots live in the TAIL of the document: far pairs diverge only in
    # the last stretch, so the banded verify scans the full shared
    # prefix before it can exit — the adversarial (and realistic: think
    # boilerplate-headed web pages differing in comments) worst case
    # its O(tau * len) bound describes. Scattered edits let the
    # early-exit fire after the ~5th mismatch and hide the growth.
    tail = min(length, max(16 * n_slots, length // 20))
    for t in range(TEMPLATES):
        base = _chars(f"tpl{t}:{length}", length)
        step = max(tail // n_slots, 1)
        slots = [
            length - tail
            + (int(hashlib.md5(f"slot{t}:{i}".encode()).hexdigest()[:8], 16)
               % step)
            + i * step
            for i in range(n_slots)
        ]
        for g in range(DOCS_PER_TEMPLATE):
            if g < DUPS_PER_TEMPLATE:
                text = _mutate(base, f"d{t}:{g}", 2 if g else 0, slots)
            else:
                text = _mutate(base, f"f{t}:{g}", far, slots)
            rows.append((did, text))
            did += 1
    return rows


def main() -> None:
    from engineering_school_bigdata_project_f1_weather_spark.operators import dedup
    from engineering_school_bigdata_project_f1_weather_spark.session import get_spark

    lengths = [int(a) for a in sys.argv[1:]] or [300, 2000, 4000]
    spark = get_spark("edit-crossover", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    for length in lengths:
        tmp = tempfile.mkdtemp(prefix="editxover_")
        try:
            spark.createDataFrame(
                build_corpus(length), "doc_id long, text string"
            ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

            d = dedup._edit_docs(spark, tmp)
            _pg, _pf, cand = dedup._edit_surfaces(d)
            n_cand = cand.count()
            spark.catalog.clearCache()

            results, walls = {}, {}
            # Single timed run per setting: at long lengths the direct
            # path is minutes-per-run (a single-task full-prefix banded
            # verify — the regime the filter exists for), and the
            # magnitudes under comparison are 2-10x, far above cold-run
            # noise; SPARK_GRAFT_XOVER_RUNS=4 restores 1-warm+3-median
            # for fine measurements at short lengths.
            n_runs = int(os.environ.get("SPARK_GRAFT_XOVER_RUNS", "1"))
            for mode in ("off", "on"):
                os.environ["SPARK_GRAFT_EDIT_FILTER"] = mode
                spans = []
                for i in range(n_runs):
                    t0 = time.perf_counter()
                    rows = dedup.dedup_edit_distance(spark, tmp).collect()
                    spark.catalog.clearCache()
                    if i or n_runs == 1:
                        spans.append(time.perf_counter() - t0)
                results[mode] = sorted(map(tuple, rows))
                walls[mode] = round(statistics.median(spans), 3)
            os.environ.pop("SPARK_GRAFT_EDIT_FILTER", None)
            assert results["off"] == results["on"], "filter changed the output!"
            print(
                json.dumps(
                    {
                        "len": length,
                        "docs": TEMPLATES * DOCS_PER_TEMPLATE,
                        "candidates": n_cand,
                        "pairs": len(results["off"]),
                        "direct_s": walls["off"],
                        "filtered_s": walls["on"],
                        "filter_wins": walls["on"] < walls["off"],
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
