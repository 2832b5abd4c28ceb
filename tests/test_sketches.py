"""Accuracy bounds for the approximate sketches.

Round 3 moved the bound INTO the query outputs (boolean
``*_within_tol`` / ``*_in_bounds`` columns the driver's oracle
compares against literal TRUE). These tests assert the booleans
actually come out True at the driver's correctness scale — i.e. the
sketches are genuinely in bounds, not vacuously compared."""

from __future__ import annotations

import duckdb

from mapreduce_experiment_spark.plans.registry import SPECS
from tests.conftest import SF_CORRECTNESS


def test_approx_distinct_within_tol(spark):
    row = (SPECS()["approx_distinct_counts"]
           .fn(spark, SF_CORRECTNESS).collect()[0])
    assert row.orders_within_tol and row.parts_within_tol \
        and row.suppliers_within_tol, row
    con = duckdb.connect()
    exact = con.execute(
        "SELECT count(DISTINCT l_orderkey), count(DISTINCT l_partkey),"
        " count(DISTINCT l_suppkey), count(*) FROM "
        f"read_parquet('{SF_CORRECTNESS}/lineitem.parquet')"
    ).fetchone()
    assert (row.exact_orders, row.exact_parts, row.exact_suppliers,
            row.n_rows) == exact


def test_approx_distinct_hll_not_under_expand(spark):
    """r18 optimization pin: the HLL sketches must aggregate in their
    OWN pass, never mixed into the exact-distinct aggregate. Mixed,
    Spark's multi-distinct rewrite keys the partial aggregate by every
    distinct key value and allocates the three rsd=0.01 HLL++ buffers
    (~13 KB each) per distinct-key group — measured 190 s executor CPU
    at sf0.1 (vs 4 s split), and a straight executor OOM at 100 TB
    key cardinalities. Split, the partial approx_count_distinct
    operators sit in a grouping-key-free aggregate."""
    df = SPECS()["approx_distinct_counts"].fn(spark, SF_CORRECTNESS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "partial_approx_count_distinct" not in line:
            continue
        # The partial-HLL HashAggregate must have empty grouping keys:
        # `HashAggregate(keys=[], functions=[partial_approx_...`.
        assert "keys=[]" in line, (
            "HLL partials grouped by distinct keys again:\n" + line)


def test_approx_percentiles_in_bounds(spark):
    rows = (SPECS()["approx_order_percentiles"]
            .fn(spark, SF_CORRECTNESS).collect())
    assert len(rows) == 5
    for r in rows:
        assert r.p50_in_bounds and r.p90_in_bounds and r.p99_in_bounds, r
        assert r.p50_exact <= r.p90_exact <= r.p99_exact
