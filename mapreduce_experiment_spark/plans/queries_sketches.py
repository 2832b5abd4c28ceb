"""Approximate-sketch queries (HLL distinct counts, quantile sketch).

These are the one capability class with NO cross-engine value oracle:
Spark's HyperLogLog++ and KLL/GK-style percentile_approx sketches are
engine-specific estimators, so DuckDB cannot reproduce their exact
outputs. They register with ``oracle=None`` — the driver applies its
weaker rows-only check — and the LOCAL tests bound the estimates
against exact values instead (tests/test_sketches.py), which is the
strongest portable statement an approximate sketch allows.

Scale rationale: at 100 TB an exact COUNT(DISTINCT) is a full shuffle
of every distinct key; the HLL sketch is a few KB per group, merged
map-side — this is the operator you actually run on a 1000-executor
cluster, so it belongs in the engine's surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register("approx_distinct_counts", oracle=None)
def q_approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count estimates over lineitem key columns, with
    the exact counts alongside (the exact side is itself a capability:
    count(distinct) per group). rsd=0.01 → ±1% typical error."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01)
            .alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01)
            .alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.01)
            .alias("approx_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("approx_order_percentiles", oracle=None)
def q_approx_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK sketch) of order value per priority —
    the streaming-friendly quantile estimator; mergeable partial
    sketches mean one shuffle of sketch state, never of raw values."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", [0.5, 0.9, 0.99], 10_000)
    return (
        orders.groupBy("o_orderpriority")
        .agg(pct.getItem(0).alias("p50"),
             pct.getItem(1).alias("p90"),
             pct.getItem(2).alias("p99"),
             F.count(F.lit(1)).alias("n_orders"))
    )
