"""Race/lap time scalar functions — native-expression re-implementations of
the reference's driver-side helpers (SURVEY T6/T7):

- ``parse_seconds``  : 'M:SS.s' / 'H:MM:SS(.ss)' / '+gap' / plain seconds →
  float seconds; NULL/'N/A' → NULL  (`Lucas files/finalversion:33-53`).
- ``format_hms``     : float seconds → 'HH:MM:SS.ss' (%05.2f), NULL → 'N/A'
  (`Lucas files/finalversion:55-63`).

Both are pure Catalyst expressions (split/cast/format_string) — they run in
whole-stage codegen, no Python, so they cost the same as any built-in at
100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def parse_seconds(col: Column) -> Column:
    """Time string → float seconds (see module docstring for grammar)."""
    s = F.regexp_replace(col, r"^\+", "")
    parts = F.split(s, ":")
    n = F.size(parts)
    one = F.element_at(parts, 1).cast("double")
    two = F.element_at(parts, 1).cast("double") * 60.0 + F.element_at(parts, 2).cast(
        "double"
    )
    three = (
        F.element_at(parts, 1).cast("double") * 3600.0
        + F.element_at(parts, 2).cast("double") * 60.0
        + F.element_at(parts, 3).cast("double")
    )
    return (
        F.when(col.isNull() | (col == "N/A"), F.lit(None).cast("double"))
        .when(n == 1, one)
        .when(n == 2, two)
        .otherwise(three)
    )


def format_hms(col: Column) -> Column:
    """Float seconds → 'HH:MM:SS.ss'; NULL → 'N/A'."""
    hh = F.floor(col / 3600.0).cast("int")
    mm = F.floor((col % 3600.0) / 60.0).cast("int")
    ss = col % 60.0
    return F.when(col.isNull(), F.lit("N/A")).otherwise(
        F.format_string("%02d:%02d:%05.2f", hh, mm, ss)
    )
