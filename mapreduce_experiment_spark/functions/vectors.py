"""Portable vector math over ``array<float>`` embedding columns.

Spark side: higher-order functions (zip_with + aggregate fold) over
double-cast arrays — JVM-side, no UDF. DuckDB side: mirrored
index-fold SQL. Outputs are quantized to 6 decimals with the
floor(+0.5) rule so last-ulp fold differences can't flip a value
hash; ranking always uses the quantized value plus an id tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def q6(col: Column) -> Column:
    """Deterministic 6-dp quantization: floor(x*1e6 + 0.5) / 1e6."""
    return F.floor(col * 1_000_000 + 0.5) / 1_000_000.0


# --- mirrored DuckDB SQL forms ---------------------------------------------

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i] * {b}[i]))"
    )


def cosine_sql(a: str, b: str) -> str:
    return (
        f"({dot_sql(a, b)} / (sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)})))"
    )


def q6_sql(expr: str) -> str:
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000.0"
