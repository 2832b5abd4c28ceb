"""Approximate-sketch queries (HLL distinct counts, quantile sketch),
driver-checkable.

Sketch outputs are engine-specific estimators (Spark HyperLogLog++ /
GK percentile sketches have no DuckDB equivalent), so the raw
estimates can never value-match a cross-engine oracle. Round 2
registered them with ``oracle=None`` expecting the driver's rows-only
mode — but the driver has no such mode (it emitted ``err:
no_oracle``). Round 3 restates each query as an oracle-compatible
contract:

- the output carries the EXACT values (oracle-computable in DuckDB:
  exact distinct counts / exact continuous quantiles), plus
- a boolean per sketch, computed Spark-side, asserting the estimate
  is within its error bound of the exact value; the oracle emits the
  same exact values and literal TRUE.

The hash matches iff the sketch is in bounds — the statement
tests/test_sketches.py used to make only locally is now a hard
driver signal. The exact side doubles as its own capability (exact
count-distinct / exact quantiles per group).

Scale rationale: at 100 TB an exact COUNT(DISTINCT) shuffles every
distinct key and an exact quantile sorts the column; the sketches are
a few KB of mergeable state per group, combined map-side — they are
what you actually run on a 1000-executor cluster. The exact
companions in these queries are the audit harness, not the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "approx_distinct_counts",
    oracle="""
SELECT count(DISTINCT l_orderkey) AS exact_orders,
       count(DISTINCT l_partkey) AS exact_parts,
       count(DISTINCT l_suppkey) AS exact_suppliers,
       count(*) AS n_rows,
       TRUE AS orders_within_tol,
       TRUE AS parts_within_tol,
       TRUE AS suppliers_within_tol
FROM lineitem
""",
)
def q_approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count estimates over lineitem key columns,
    verified in-plan against the exact counts.

    rsd=0.01 → ~1% standard error; the bound checked is 5× that
    (``abs(approx - exact) <= max(0.05 * exact, 1)``), a ≥5σ margin.
    HLL++ is deterministic for fixed data, so the driver's sf0.01 run
    reproduces exactly what the local mirror verified.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = {"orders": "l_orderkey", "parts": "l_partkey",
            "suppliers": "l_suppkey"}
    agg = li.agg(
        *[F.countDistinct(c).alias(f"exact_{k}") for k, c in cols.items()],
        *[F.approx_count_distinct(c, rsd=0.01).alias(f"_approx_{k}")
          for k, c in cols.items()],
        F.count(F.lit(1)).alias("n_rows"),
    )

    def within_tol(k: str) -> Column:
        exact = F.col(f"exact_{k}")
        return (F.abs(F.col(f"_approx_{k}") - exact)
                <= F.greatest(exact * 0.05, F.lit(1))).alias(f"{k}_within_tol")

    return agg.select(
        *[F.col(f"exact_{k}") for k in cols],
        "n_rows",
        *[within_tol(k) for k in cols],
    )


# Exact quantiles are continuous (linear-interpolation at p*(n-1)) on
# integer cents — Spark `percentile` and DuckDB `quantile_cont` share
# that definition, and the q4 floor-quantization absorbs any last-ulp
# interpolation difference (parity verified empirically at sf0.01).
_PS = (0.5, 0.9, 0.99)
# Rank window for the in-bounds check: the GK sketch at accuracy
# 10_000 guarantees rank error <= n/10_000; the exact quantiles at
# p ± 0.02 bound a rank slack of 0.02*n — 200× the guarantee.
_BOUNDS = (0.48, 0.52, 0.88, 0.92, 0.97, 1.0)


@register(
    "approx_order_percentiles",
    oracle="""
WITH q AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderpriority, count(*) AS n_orders,
       floor(quantile_cont(cents, 0.5) * 100 + 0.5) / 10000.0 AS p50_exact,
       floor(quantile_cont(cents, 0.9) * 100 + 0.5) / 10000.0 AS p90_exact,
       floor(quantile_cont(cents, 0.99) * 100 + 0.5) / 10000.0 AS p99_exact,
       TRUE AS p50_in_bounds,
       TRUE AS p90_in_bounds,
       TRUE AS p99_in_bounds
FROM q GROUP BY o_orderpriority
""",
)
def q_approx_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch) of order value per priority,
    verified in-plan against exact quantiles.

    The sketch value must lie between the exact continuous quantiles
    at p−0.02 and p+0.02 (p99's upper bound clamps to the max) — the
    rank-error statement a quantile sketch actually guarantees,
    checked with 200× headroom over the accuracy-10k bound. Exact
    quantiles are computed over integer cents and quantized to 4 dp,
    mirrored by DuckDB quantile_cont.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    g = (
        orders.select("o_orderpriority", cents.alias("cents"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.percentile("cents", F.array(*[F.lit(p) for p in _PS]))
                .alias("_exact"),
            F.percentile("cents", F.array(*[F.lit(p) for p in _BOUNDS]))
                .alias("_band"),
            F.percentile_approx("cents", list(_PS), 10_000).alias("_approx"),
        )
    )

    def q4_dollars(c: Column) -> Column:
        return F.floor(c * 100 + 0.5) / 10000.0

    def in_bounds(i: int) -> Column:
        ap = F.col("_approx").getItem(i)
        return ((ap >= F.col("_band").getItem(2 * i))
                & (ap <= F.col("_band").getItem(2 * i + 1)))

    return g.select(
        "o_orderpriority", "n_orders",
        *[q4_dollars(F.col("_exact").getItem(i)).alias(f"p{int(p * 100)}_exact")
          for i, p in enumerate(_PS)],
        *[in_bounds(i).alias(f"p{int(p * 100)}_in_bounds")
          for i, p in enumerate(_PS)],
    )
