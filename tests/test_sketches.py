"""Accuracy bounds for the approximate sketches (no cross-engine
oracle is possible, so the local gate bounds them against exact
values computed on the same data)."""

from __future__ import annotations

import duckdb

from mapreduce_experiment_spark.plans.registry import SPECS
from tests.conftest import SF_CORRECTNESS


def test_approx_distinct_within_rsd(spark):
    row = (SPECS()["approx_distinct_counts"]
           .fn(spark, SF_CORRECTNESS).collect()[0])
    con = duckdb.connect()
    exact = con.execute(
        "SELECT count(DISTINCT l_orderkey), count(DISTINCT l_partkey),"
        " count(DISTINCT l_suppkey), count(*) FROM "
        f"read_parquet('{SF_CORRECTNESS}/lineitem.parquet')"
    ).fetchone()
    assert row.n_rows == exact[3]
    for approx, true in [(row.approx_orders, exact[0]),
                         (row.approx_parts, exact[1]),
                         (row.approx_suppliers, exact[2])]:
        assert abs(approx - true) / true < 0.05, (approx, true)


def test_approx_percentiles_bracket_exact(spark):
    rows = (SPECS()["approx_order_percentiles"]
            .fn(spark, SF_CORRECTNESS).collect())
    con = duckdb.connect()
    exact = {
        r[0]: r[1:]
        for r in con.execute(
            "SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5),"
            " quantile_cont(o_totalprice, 0.9),"
            " quantile_cont(o_totalprice, 0.99) FROM "
            f"read_parquet('{SF_CORRECTNESS}/orders.parquet') GROUP BY 1"
        ).fetchall()
    }
    assert {r.o_orderpriority for r in rows} == set(exact)
    for r in rows:
        e50, e90, e99 = exact[r.o_orderpriority]
        assert r.p50 <= r.p90 <= r.p99
        for got, want in [(r.p50, e50), (r.p90, e90), (r.p99, e99)]:
            assert abs(got - want) / want < 0.02, (r.o_orderpriority, got, want)
