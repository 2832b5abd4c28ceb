"""As-of join query: each purchase event matched to the user's most
recent click at or before it. The oracle uses DuckDB's NATIVE
``ASOF LEFT JOIN`` — an independent implementation of the semantics,
not a mirror of the Spark plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table
from .registry import register


@register(
    "purchase_last_click_asof",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       c.event_id AS click_event_id, c.ts AS click_ts
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Right side deduped to unique (user_id, ts) — keeps the as-of
    # tie-break deterministic across engines. max(event_id) per key,
    # not a row_number window (r16): identical selection (the oracle's
    # rn=1 under event_id DESC), but the aggregate partial-combines
    # map-side and needs no post-shuffle sort.
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    return asof_join(
        purchases, clicks, on=["user_id"],
        left_ts="ts", right_ts="click_ts",
        right_payload=["click_event_id", "click_ts"],
    )
