"""Exact fixed-point integer log2 — the cross-engine log kernel.

The engine's determinism contract (plans/f1_model.py) forbids
floating-point transcendentals in any hashed output: neither IEEE 754
nor the SQL standard requires ``ln``/``log2`` to be correctly rounded,
so Spark's ``Math.log`` and DuckDB's ``std::log`` may disagree in the
last ulp and a ``floor(1e6 * ln(x))`` at a rounding boundary would
hash-mismatch.  Log-domain models (Naive Bayes log-odds — the round-11
trained quality classifier) therefore use THIS kernel: ``log2(x)`` in
Q16 fixed point (integer units of 2**-16), computed with nothing but
int64 multiply / shift / compare via the classic shift-and-square
algorithm, so both engines produce the SAME BIGINT for every input.

    ilog2_q16(x) = floor-ish(log2(x) * 65536), exact algorithmically:
      e = floor(log2 x)            -- bit length
      m = x normalized to [2^30, 2^31)
      16 rounds of: m <- m*m >> 30; emit bit (m >= 2^31), halve if set
      result = (e << 16) | bits

    max abs error vs true log2: < 2**-16 + normalization truncation
    (< 2**-30 relative) — ~1.6e-5, far below any model's decision
    margins of interest.

Domain: 0 <= x < 2**63 (int64).  ``ilog2_q16(0)`` is DEFINED as 0 in
both realizations (bin(0) = '0' gives e = 0, m = 0, all fraction bits
0) so degenerate model counts never raise; callers that care guard
upstream.  m < 2**31 keeps m*m < 2**62 inside int64.

Two realizations, pinned equal by tests/test_functions.py:
- :func:`ilog2_q16` — Python ints, for driver-side model finalization
  over BOUNDED count tables (the kmeans/BPE bounded-collect precedent).
- :func:`ilog2_steps_sql` — a generated DuckDB CTE chain applying the
  same 16 rounds to several columns of a relation at once, for oracle
  SQL strings.
"""

from __future__ import annotations

LOG2_FRAC_BITS = 16
LOG2_ONE = 1 << LOG2_FRAC_BITS  # 1.0 in Q16


def ilog2_q16(x: int) -> int:
    """Q16 fixed-point log2 of a nonnegative int64; 0 for x <= 0."""
    if x <= 0:
        return 0
    e = x.bit_length() - 1
    m = x << (30 - e) if e <= 30 else x >> (e - 30)
    frac = 0
    for _ in range(LOG2_FRAC_BITS):
        m = (m * m) >> 30
        frac <<= 1
        if m >= 1 << 31:
            frac |= 1
            m >>= 1
    return (e << LOG2_FRAC_BITS) + frac


def ilog2_steps_sql(
    source: str, targets: dict[str, str], passthrough: list[str]
) -> str:
    """A DuckDB subquery computing ``ilog2_q16`` of several columns.

    ``source``: relation (CTE name or parenthesized subquery) to read.
    ``targets``: {out_col: input_expr} — each input expr must be a
    nonnegative BIGINT expression over ``source``'s columns.
    ``passthrough``: columns of ``source`` carried through unchanged.

    Returns a parenthesized subquery selecting ``passthrough + targets``
    — splice it into a FROM clause.  The chain is 1 normalization level
    + LOG2_FRAC_BITS squaring levels of plain int64 arithmetic; applied
    to bounded relations (the B-bucket model grid, the 1-row totals),
    so its size never meets data volume."""
    cols = list(targets)
    pt = ", ".join(passthrough) + (", " if passthrough else "")
    # level 0: seed x/e/m/f per target
    seed_x = ", ".join(
        f"CAST({expr} AS BIGINT) AS x_{c}" for c, expr in targets.items()
    )
    lvl = f"(SELECT {pt}{seed_x} FROM {source}) q_x"
    seed_e = ", ".join(
        f"length(bin(x_{c})) - 1 AS e_{c}" for c in cols
    )
    lvl = f"(SELECT {pt}{', '.join(f'x_{c}' for c in cols)}, {seed_e} FROM {lvl}) q_e"
    seed_m = ", ".join(
        f"CASE WHEN x_{c} = 0 THEN 0 WHEN e_{c} <= 30 "
        f"THEN x_{c} * (1::BIGINT << (30 - e_{c})) "
        f"ELSE x_{c} // (1::BIGINT << (e_{c} - 30)) END AS m_{c}, "
        f"0::BIGINT AS f_{c}"
        for c in cols
    )
    keep = ", ".join(f"e_{c}" for c in cols)
    lvl = f"(SELECT {pt}{keep}, {seed_m} FROM {lvl}) q_m"
    for i in range(LOG2_FRAC_BITS):
        step = ", ".join(
            f"CASE WHEN (m_{c} * m_{c}) // 1073741824 >= 2147483648 "
            f"THEN ((m_{c} * m_{c}) // 1073741824) // 2 "
            f"ELSE (m_{c} * m_{c}) // 1073741824 END AS m_{c}, "
            f"f_{c} * 2 + CASE WHEN (m_{c} * m_{c}) // 1073741824 "
            f">= 2147483648 THEN 1 ELSE 0 END AS f_{c}"
            for c in cols
        )
        lvl = f"(SELECT {pt}{keep}, {step} FROM {lvl}) q_{i}"
    out = ", ".join(
        f"e_{c} * {LOG2_ONE} + f_{c} AS {c}" for c in cols
    )
    return f"(SELECT {pt}{out} FROM {lvl})"
