"""Cross-engine-deterministic numeric aggregation.

Floating-point sums are order-dependent: Spark and DuckDB aggregate
the same doubles in different orders and can disagree in the last
ulps, and engine ``round()`` implementations disagree on exact .5 —
either is enough to flip the driver's value hash (observed:
``round(avg(o_totalprice), 4)`` → 237217.9588 vs 237217.9587).

Fix: quantize each element to integer "cents" BEFORE aggregating.
Integer sums are exact and order-independent, so both engines hold
bit-identical intermediates, and every subsequent step (IEEE double
multiply/divide, floor) is deterministic on identical inputs. Each
helper has a Spark form and a mirrored DuckDB-SQL form; keep them in
lockstep.

This also matches 100 TB reality: money-like measures should be
fixed-point (DECIMAL / integer cents) at scale anyway — float sums
over 10^12 rows lose pennies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qsum(col: Column, scale: int = 100) -> Column:
    """Exact quantized sum: ``sum(round(x*scale)::long) / scale``."""
    cents = F.sum(F.round(col * scale, 0).cast("long"))
    return cents / float(scale)


def qsum_sql(expr: str, scale: int = 100) -> str:
    return f"sum(CAST(round(({expr}) * {scale}) AS BIGINT)) / {scale}.0"


def qavg(col: Column, p: int = 4, scale: int = 100) -> Column:
    """Average rounded to ``p`` decimals via exact integer arithmetic:
    ``floor(cents * 10^p / (scale*n) + 0.5) / 10^p``."""
    cents = F.sum(F.round(col * scale, 0).cast("long"))
    mult = float(10 ** p)
    return F.floor(cents * mult / (scale * F.count(F.lit(1))) + 0.5) / mult


def qavg_sql(expr: str, p: int = 4, scale: int = 100) -> str:
    mult = 10 ** p
    return (
        f"floor(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) * {mult}.0"
        f" / ({scale} * count(*)) + 0.5) / {mult}.0"
    )


def q2(col: Column) -> Column:
    """Deterministic 2-dp quantization of a scalar (non-aggregated)
    double: ``floor(x*100 + 0.5) / 100`` — engine round() differs at
    exact halves, floor does not."""
    return F.floor(col * 100 + 0.5) / 100.0


def q2_sql(expr: str) -> str:
    return f"floor(({expr}) * 100 + 0.5) / 100.0"
