"""Vector math over ``array<float>`` embedding columns.

Determinism contract (see plans/f1_model.py): embeddings are quantized to
integer grid points (``floor(x * 1024 + 0.5)`` — float32→double is exact
and 1024 is a power of two, so the product is exact and floor is
unambiguous in every engine). Dot products and norms are then exact
integer sums — order-independent — and the final cosine is a single
division + sqrt on identical operands, so Spark and DuckDB produce
bit-identical doubles.

Similarities are reported as ``sim_e6 = floor(sim * 1e6)`` BIGINT —
no round-half mode dependence anywhere.

Everything here is built-in higher-order functions (zip_with/aggregate/
transform) running in the JVM — no UDFs, fully codegen'd, scale-safe.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

QUANT = 1024.0


def quantize(v: Column) -> Column:
    """array<float> → array<long> on the 1/1024 grid."""
    return F.transform(v, lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)))


def dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    return dot(a, a)


def sim_e6(dot_col: Column, n2a: Column, n2b: Column) -> Column:
    """floor(cosine * 1e6) as BIGINT — deterministic across engines.

    Total on zero-norm vectors (round-4 review): 0/0 would be NaN, whose
    long cast is 0 in a non-ANSI session but an ERROR under ANSI (the
    driver's mode) and a conversion error in DuckDB — so both this and
    :func:`sim_e6_sql` define the zero-norm cosine as 0 explicitly, and
    the Arrow verify (`similarity._verify_pairs_arrow`) maps its NaNs to
    0 to match."""
    return (
        F.when((n2a == 0) | (n2b == 0), F.lit(0))
        .otherwise(
            F.floor(
                dot_col.cast("double") * F.lit(1_000_000.0)
                / F.sqrt(n2a.cast("double") * n2b.cast("double"))
            )
        )
        .cast("long")
    )


# --- DuckDB twins (generated SQL fragments) -------------------------------

def quantize_sql(expr: str) -> str:
    return f"list_transform({expr}, x -> floor(CAST(x AS DOUBLE) * {QUANT} + 0.5))"


def dot_sql(a: str, b: str) -> str:
    # floor() in DuckDB returns DOUBLE, but values are exact integers well
    # under 2^53, so sums stay exact regardless of order.
    return f"list_dot_product({a}, {b})"


def sim_e6_sql(dot_expr: str, n2a: str, n2b: str) -> str:
    return (
        f"CAST(CASE WHEN {n2a} = 0 OR {n2b} = 0 THEN 0 "
        f"ELSE FLOOR(CAST({dot_expr} AS DOUBLE) * 1000000.0 "
        f"/ SQRT(CAST({n2a} AS DOUBLE) * CAST({n2b} AS DOUBLE))) END AS BIGINT)"
    )
