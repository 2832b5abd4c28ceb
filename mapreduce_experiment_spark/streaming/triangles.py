"""Incremental triangle enumeration over an edge stream.

The reference's workload (SURVEY §7 step 6), streaming-first: edges
arrive in micro-batches; each batch emits exactly the triangles it
COMPLETES (the batch carries the triangle's last missing edge), so
the union of all batch outputs equals the batch-mode triangle set —
no recomputation of old triangles, state grows only by the deduped
edge delta.

Incremental step for a batch B against accumulated edge state E:

1. ``B_new = canonical(B) − E`` (anti-join: duplicates and already-
   seen edges never re-enter, so a triangle can't be emitted twice).
2. ``E' = E ∪ B_new``.
3. A triangle completed by this batch contains ≥1 edge of ``B_new``
   and its other two edges in ``E'``: for each (a,b) ∈ B_new, every w
   adjacent to both a and b in E' closes one. Enumerated as two
   adjacency joins + distinct (a triangle whose 2nd/3rd edge is also
   in ``B_new`` is found from each of them — distinct dedups within
   the batch; across batches step 1 makes re-finding impossible).

State and output are parquet directories (append) — the pattern that
scales: the edge state is the deduped simple graph, partitioned
storage at cluster scale, and foreachBatch gives exactly-once output
per micro-batch id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import canonical_edges
from .pipeline import _COUNTER

_EDGE_SCHEMA = "src long, dst long"


def _process_batch(batch: DataFrame, state_dir: str, out_dir: str) -> None:
    spark = batch.sparkSession
    new = canonical_edges(batch)
    if os.path.exists(state_dir):
        state = spark.read.schema("u long, v long").parquet(state_dir)
        new = new.join(state, ["u", "v"], "left_anti")
    else:
        state = spark.createDataFrame([], "u long, v long")
    new = new.persist()

    all_edges = state.unionByName(new).persist()
    adj_x = all_edges.select(F.col("u").alias("a"), F.col("v").alias("w")) \
        .unionByName(all_edges.select(F.col("v").alias("a"), F.col("u").alias("w")))
    adj_y = adj_x.select(F.col("a").alias("b"), F.col("w").alias("w2"))

    tris = (
        new.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .join(adj_x, "a")
        .join(adj_y.withColumnRenamed("w2", "w"), ["b", "w"])
        .where((F.col("w") != F.col("a")) & (F.col("w") != F.col("b")))
    )
    abc = F.array_sort(F.array("a", "b", "w"))
    tris = tris.select(
        abc.getItem(0).alias("ta"),
        abc.getItem(1).alias("tb"),
        abc.getItem(2).alias("tc"),
    ).distinct()

    tris.write.mode("append").parquet(out_dir)
    new.write.mode("append").parquet(state_dir)
    new.unpersist()
    all_edges.unpersist()


def streaming_triangles(spark: SparkSession, edges_dir: str,
                        work_dir: str) -> DataFrame:
    """Run the incremental pipeline over parquet edge files arriving
    one file per micro-batch; returns the accumulated triangle set."""
    state_dir = os.path.join(work_dir, "edge_state")
    out_dir = os.path.join(work_dir, "triangles_out")
    run = next(_COUNTER)

    stream = (
        spark.readStream.schema(_EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(edges_dir)
    )
    q = (
        stream.writeStream
        .foreachBatch(lambda b, _id: _process_batch(b, state_dir, out_dir))
        .option("checkpointLocation", os.path.join(work_dir, f"ckpt_{run}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema("ta long, tb long, tc long").parquet(out_dir)
        .select(F.col("ta").alias("a"), F.col("tb").alias("b"),
                F.col("tc").alias("c"))
    )
