"""As-of (most-recent-at-or-before) join.

Spark has no native ASOF JOIN. The scalable emulation is the
union-and-carry-forward pattern: tag both sides, union, sort within
the equi-key by event time, carry the last right-side row forward
with a window, keep left rows. One shuffle + one sort — no range
cross-product, no per-key explosion, works at any key cardinality
(contrast a naive ``ON l.key = r.key AND r.ts <= l.ts`` join, which
is quadratic per key).

The DuckDB oracle uses its NATIVE ``ASOF JOIN`` — an independent
implementation, so the check validates semantics, not shared code.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_payload: Sequence[str]) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys
    (left rows with no prior right row keep nulls).

    Ties: a right row at exactly ``left_ts`` matches; among right rows
    with identical timestamps the LAST in (ts, payload-order) wins —
    callers needing stricter tie-breaks should pre-dedup the right
    side.
    """
    # Collision guards (r14 review): a right_payload name that also
    # exists on the LEFT would be silently dropped at the end and
    # replaced by the carried as-of value — left data loss with no
    # error; the internal tag columns would likewise be clobbered.
    clash = set(right_payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: right_payload column(s) {sorted(clash)} already "
            "exist on the left side — rename one side first")
    reserved = {"_t", "_side"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join: column name(s) {sorted(reserved)} are reserved "
            "by the union-and-carry-forward implementation")
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    rt = right.select(
        *on, F.col(right_ts).alias("_t"),
        *[F.col(c) for c in right_payload],
    ).withColumn("_side", F.lit(0))

    all_cols = set(lt.columns) | set(rt.columns)
    lt2 = lt.select(*[
        F.col(c) if c in lt.columns else F.lit(None).alias(c)
        for c in sorted(all_cols)
    ])
    rt2 = rt.select(*[
        F.col(c) if c in rt.columns else F.lit(None).alias(c)
        for c in sorted(all_cols)
    ])
    unioned = lt2.unionByName(rt2)

    # Right rows sort before left rows at equal _t (side 0 < 1), so a
    # same-timestamp right row is visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
             .over(w).alias(f"_asof_{c}")
            for c in right_payload
        ],
    )
    out = carried.where(F.col("_side") == 1).drop("_t", "_side", *right_payload)
    for c in right_payload:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    return out
