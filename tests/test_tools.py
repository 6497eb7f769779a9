"""Unit tests for the round-4 harness surface: the bench regression gate
and the selfcheck canonicalizer the correctness artifacts depend on."""

from __future__ import annotations

import json
import sys


def test_bench_compare_gate(tmp_path):
    sys.path.insert(0, "/root/repo")
    import bench

    prior = tmp_path / "prior.json"
    prior.write_text(json.dumps({"queries": {"a": 1.0, "b": 2.0}}))

    # within factor → pass
    assert bench.compare(str(prior), {"a": 1.4, "b": 2.9, "new": 9.9}) == 0
    # headline query beyond factor AND the 0.2 s additive slack → fail
    assert bench.compare(str(prior), {"a": 1.75, "b": 1.0}) == 1
    # beyond factor but inside the additive slack → jitter, pass
    # (tiered gate, ADVICE r9: median-of-3 headline entries absorb
    # scheduler/GC noise additively instead of via a blanket 1 s floor)
    assert bench.compare(str(prior), {"a": 1.6, "b": 1.0}) == 0
    # sub-second plan-shape regression on a headline query still gates
    # (the case the old absolute floor silenced: 0.05 s -> 0.95 s = 19x)
    fast = tmp_path / "fast.json"
    fast.write_text(json.dumps({"queries": {"a": 0.05}}))
    assert bench.compare(str(fast), {"a": 0.95}) == 1
    # TAIL entries are single-run: under the 1 s floor any ratio passes,
    # at/above it the factor gates
    tail_name = bench.TAIL_BENCH[0]
    tprior = tmp_path / "tail.json"
    tprior.write_text(json.dumps({"queries": {tail_name: 0.1}}))
    assert bench.compare(str(tprior), {tail_name: 0.9}) == 0
    assert bench.compare(str(tprior), {tail_name: 1.1}) == 1
    # driver-wrapped {"parsed": {...}} form also accepted
    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(
        json.dumps({"parsed": {"queries": {"a": 1.0}}, "tail": "..."})
    )
    assert bench.compare(str(wrapped), {"a": 1.2}) == 0
    assert bench.compare(str(wrapped), {"a": 2.0}) == 1


def test_selfcheck_canonicalizer_is_order_and_rep_stable():
    sys.path.insert(0, "/root/repo/tools")
    import math

    import numpy as np
    from selfcheck import canon_cell, canon_rows

    # row order and column order must not affect the hash
    h1, _ = canon_rows(["b", "a"], [(2, 1), (4, 3)])
    h2, _ = canon_rows(["a", "b"], [(3, 4), (1, 2)])
    assert h1 == h2

    # value representations that the two engines legitimately produce
    assert canon_cell(True) == canon_cell(np.bool_(True)) == "1"
    assert canon_cell(float("nan")) == "NaN" and canon_cell(math.nan) == "NaN"
    assert canon_cell(0.1) == canon_cell(np.float64(0.1))
    assert canon_cell(None) == "NULL"
    assert canon_cell(b"\x01\xff") == "01ff"
    assert canon_cell([1, 2]) == canon_cell(np.array([1, 2], dtype=np.int64))
    # but genuinely different doubles stay different (bit-exact contract)
    assert canon_cell(0.1) != canon_cell(0.1 + 1e-16)
