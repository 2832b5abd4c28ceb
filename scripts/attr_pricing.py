"""pricing_summary decimal-wall attribution (r17, verdict item 2).

The r16 money migration moved pricing_summary's money accumulators
from long to decimal(29,0) sums (functions/compare.py), and the r16
bench recorded its sf0.1 wall at 2.29x the r1 baseline with executor
CPU 329 -> 1,306 ms. The r16 BENCHNOTES *argued* the cost is
per-row decimal accumulation that parallelism absorbs at cluster
scale; this script replaces the argument with a measurement:

1. Buffer-count sweep (k = 0..5 money buffers over the identical
   filtered scan + group): per-buffer CPU cost, decimal vs the old
   long form. The expressions are pricing_summary's DISTINCT money
   expressions — Catalyst deduplicates identical aggregate buffers,
   so qsum(l_quantity) and qavg(l_quantity)'s internal sum share ONE
   buffer and the registered query carries 5 distinct money buffers
   (+ count), not 7. Decimal and long twins share every projection
   (round, multiply, filter, group) and differ only in the
   accumulator cast, so the slope difference isolates the decimal
   accumulation cost.

2. Full-query twin: the registered decimal query vs a long-twin
   rebuilt with the same expressions — the delta that must be
   "explained to the millisecond", cross-checked against 5x the
   per-buffer slope delta.

3. Many-task scan (the verdict's "scan isn't 2 tasks" demo): the
   sf0.1 lineitem parquet is ONE 600k-row row group = one scan task,
   so the whole per-row cost lands on a single core and shows up
   1:1 in wall. Reading the file 10x (6M rows, 10 independent scan
   tasks — an sf1-scale one-off) keeps the per-row CPU fraction but
   spreads it over 10 cores: the wall delta per input row collapses
   while total CPU stays ~10x the 1-task run. On a 1000-executor
   cluster a group's rows arrive over thousands of scan tasks, so
   the per-task (= wall) decimal surcharge is the per-TASK row
   count's, not the group total's.

Methodology matches bench.py: noop sink (full execution, no
collect), spark.catalog.clearCache() between runs, min over N runs
(wall AND per-stage-metric min via _merge_deltas), executor CPU from
the AppStatusStore stage deltas. Run on a quiet box; results land in
BENCHNOTES.md (r17).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _merge_deltas, _stage_delta, _stage_snapshot  # noqa: E402
from mapreduce_experiment_spark.functions.compare import cents  # noqa: E402
from mapreduce_experiment_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("ATTR_RUNS", "5"))


def cents_long_pre_r16(col, scale: int = 100):
    """The pre-r16 accumulator form: identical projection (round,
    multiply), long cast instead of decimal(19,0) — the ANSI-overflow
    form the migration replaced; safe here (sf0.1 and the 10x read
    stay ~9 orders below 2^63 per group). Deliberately NOT the
    package's functions/compare.py cents_long (a chunk-bounded
    level-1 quantizer with a different contract): this local must
    stay frozen as the historical baseline the benchmark measures —
    do not "clean up" by importing the package export (ADVICE r17)."""
    return F.round(col * scale, 0).cast("long")


def _money_exprs(quant):
    """pricing_summary's five DISTINCT money buffers, in plan order."""
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    disc_price = price * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return [
        F.sum(quant(qty)).alias("b_qty"),
        F.sum(quant(price)).alias("b_price"),
        F.sum(quant(disc_price)).alias("b_disc_price"),
        F.sum(quant(charge)).alias("b_charge"),
        F.sum(quant(F.col("l_discount"), 10000)).alias("b_disc"),
    ]


def _filtered(li: DataFrame) -> DataFrame:
    return li.where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))


def sweep_query(li: DataFrame, kind: str, k: int) -> DataFrame:
    quant = cents if kind == "decimal" else cents_long_pre_r16
    aggs = _money_exprs(quant)[:k] + [F.count(F.lit(1)).alias("n")]
    return (_filtered(li)
            .groupBy("l_returnflag", "l_linestatus").agg(*aggs))


def full_query(li: DataFrame, kind: str) -> DataFrame:
    """The registered pricing_summary shape (5 distinct money buffers
    + count + the post-aggregation qavg arithmetic) with the
    accumulator kind swapped — the long twin IS the pre-r16 query."""
    quant = cents if kind == "decimal" else cents_long_pre_r16
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    disc_price = price * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))

    def q_sum(c, scale=100):
        return F.sum(quant(c, scale)) / float(scale)

    def q_avg(c, p, scale=100):
        s = F.sum(quant(c, scale))
        mult = float(10 ** p)
        return F.floor(s * mult / (scale * n) + 0.5) / mult

    return (_filtered(li)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(q_sum(qty).alias("sum_qty"),
                 q_sum(price).alias("sum_base_price"),
                 q_sum(disc_price).alias("sum_disc_price"),
                 q_sum(charge).alias("sum_charge"),
                 q_avg(qty, 4).alias("avg_qty"),
                 q_avg(price, 4).alias("avg_price"),
                 q_avg(F.col("l_discount"), 6, 10000).alias("avg_disc"),
                 n.alias("count_order")))


def measure(spark, build, runs: int = RUNS) -> dict:
    """min-over-runs wall + stage-metric delta for one plan."""
    best_wall = None
    best_delta: dict | None = None
    for _ in range(runs):
        spark.catalog.clearCache()
        before = _stage_snapshot(spark)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = _stage_snapshot(spark)
        best_wall = wall if best_wall is None else min(best_wall, wall)
        if before is not None and after is not None:
            d = _stage_delta(before, after)
            best_delta = d if best_delta is None else _merge_deltas(
                best_delta, d)
    out = {"wall_s": round(best_wall, 3)}
    if best_delta:
        out["cpu_ms"] = best_delta.get("executor_cpu_time_ms")
        out["run_ms"] = best_delta.get("executor_run_time_ms")
    return out


def main() -> None:
    spark = get_session(app_name="attr-pricing")
    path = os.path.join(SF_DIR, "lineitem.parquet")
    li1 = spark.read.parquet(path)  # one row group -> one scan task
    li10 = spark.read.parquet(*([path] * 10))  # 10 tasks, 6M rows

    out: dict = {"sf_dir": SF_DIR, "runs_per_point": RUNS,
                 "loadavg_1m_before": round(os.getloadavg()[0], 2)}

    # warm-up (JIT/codegen/file metadata)
    li1.limit(1000).write.format("noop").mode("overwrite").save()

    # 1. buffer sweep at the native 1-task scan
    sweep: dict = {}
    for kind in ("decimal", "long"):
        sweep[kind] = {
            str(k): measure(spark, lambda k=k, kind=kind: sweep_query(
                li1, kind, k)) for k in range(6)}
    out["sweep_1task"] = sweep

    # 2. full-query twins, 1-task scan
    out["full_1task"] = {
        kind: measure(spark, lambda kind=kind: full_query(li1, kind))
        for kind in ("decimal", "long")}

    # 3. full-query twins, 10-task scan (6M rows)
    out["full_10task"] = {
        kind: measure(spark, lambda kind=kind: full_query(li10, kind))
        for kind in ("decimal", "long")}

    # derived attribution numbers
    try:
        rows_1t, rows_10t = 600_000, 6_000_000
        d5 = sweep["decimal"]["5"]["cpu_ms"]
        d0 = sweep["decimal"]["0"]["cpu_ms"]
        l5 = sweep["long"]["5"]["cpu_ms"]
        l0 = sweep["long"]["0"]["cpu_ms"]
        per_buf_dec = (d5 - d0) / 5.0
        per_buf_long = (l5 - l0) / 5.0
        fd, fl = out["full_1task"]["decimal"], out["full_1task"]["long"]
        fd10, fl10 = out["full_10task"]["decimal"], out["full_10task"]["long"]
        out["attribution"] = {
            "per_buffer_cpu_ms_decimal": round(per_buf_dec, 1),
            "per_buffer_cpu_ms_long": round(per_buf_long, 1),
            "decimal_vs_long_per_buffer_ratio": round(
                per_buf_dec / per_buf_long, 2) if per_buf_long else None,
            "per_row_per_buffer_ns_decimal": round(
                per_buf_dec * 1e6 / rows_1t, 1),
            "per_row_per_buffer_ns_long": round(
                per_buf_long * 1e6 / rows_1t, 1),
            "full_delta_cpu_ms_1task": fd["cpu_ms"] - fl["cpu_ms"],
            "predicted_delta_from_slope_ms": round(
                5 * (per_buf_dec - per_buf_long), 1),
            "full_delta_wall_s_1task": round(
                fd["wall_s"] - fl["wall_s"], 3),
            "full_delta_cpu_ms_10task": fd10["cpu_ms"] - fl10["cpu_ms"],
            "full_delta_wall_s_10task": round(
                fd10["wall_s"] - fl10["wall_s"], 3),
            "wall_delta_per_Mrow_s_1task": round(
                (fd["wall_s"] - fl["wall_s"]) / (rows_1t / 1e6), 3),
            "wall_delta_per_Mrow_s_10task": round(
                (fd10["wall_s"] - fl10["wall_s"]) / (rows_10t / 1e6), 3),
            "decimal_cpu_fraction_of_full_10task": round(
                (fd10["cpu_ms"] - fl10["cpu_ms"]) / fd10["cpu_ms"], 3),
        }
    except (KeyError, TypeError):
        out["attribution"] = None  # status-store surface drifted
    out["loadavg_1m_after"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
