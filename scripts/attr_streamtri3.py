"""r19 fine-grained attribution of the DELTA-STATE _process_batch:
replays batches 0..k-1 for real state, then runs batch k's jobs one
at a time behind stage-metric snapshots (mirrors _process_batch's
actual job boundaries: count, hub count, tris write, state writes).

Usage: python scripts/attr_streamtri3.py [--sf-dir ...] [--k 2]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from bench import _stage_delta, _stage_snapshot  # noqa: E402
from mapreduce_experiment_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=2)
    args = ap.parse_args()

    spark = get_session(app_name="attr-streamtri3")
    from pyspark.sql import functions as F

    from mapreduce_experiment_spark.operators.graph import canonical_edges
    from mapreduce_experiment_spark.plans.queries_graph import derive_edges
    from mapreduce_experiment_spark.streaming import triangles as st

    def timed(label: str, fn):
        spark.sparkContext.setJobDescription(label)
        before = _stage_snapshot(spark)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        delta = _stage_delta(before, _stage_snapshot(spark))
        print(f"{label:46s} wall={dt:7.2f}s cpu={delta['executor_cpu_time_ms']/1e3:7.2f}s "
              f"shW={delta['shuffle_write_bytes']/1e6:8.2f}MB", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    work = tempfile.mkdtemp(prefix="attr_stri3_")
    try:
        edges_dir = f"{work}/edges_in"
        derive_edges(spark, args.sf_dir).repartition(3) \
            .write.parquet(edges_dir)
        state_dir = os.path.join(work, "edge_state")
        out_dir = os.path.join(work, "triangles_out")
        deg_dir = os.path.join(work, "deg_state")
        adj_dir = os.path.join(work, "adj_state")
        files = sorted(
            f for f in os.listdir(edges_dir) if f.endswith(".parquet"))
        for i in range(args.k):
            batch = spark.read.schema(st._EDGE_SCHEMA).parquet(
                os.path.join(edges_dir, files[i]))
            st._process_batch(batch, f"r0b{i}", state_dir, out_dir)
        print(f"--- dissecting batch {args.k} (new delta shape) ---")
        batch = spark.read.schema(st._EDGE_SCHEMA).parquet(
            os.path.join(edges_dir, files[args.k]))
        batch_key = f"r0b{args.k}"

        new_raw = canonical_edges(batch).persist()
        n_new = timed("1 canonical distinct + count", new_raw.count)
        state = st._read_batches(spark, state_dir, "u long, v long",
                                 exclude_key=batch_key)
        seen = state.join(F.broadcast(new_raw), ["u", "v"], "left_semi")
        new = new_raw.join(F.broadcast(seen), ["u", "v"], "left_anti") \
            .persist()
        timed("1b anti-join new2 count", new.count)
        sym_new = new.select(
            F.explode(F.array(
                F.struct(F.col("u").alias("a"), F.col("v").alias("w")),
                F.struct(F.col("v").alias("a"), F.col("u").alias("w")),
            )).alias("e")).select("e.a", "e.w")
        degd = sym_new.groupBy("a").agg(
            F.count(F.lit(1)).alias("d")).persist()
        deg_prior = st._read_batches(spark, deg_dir, "a long, d long",
                                     exclude_key=batch_key)
        hubs = (deg_prior.unionByName(degd)
                .groupBy("a").agg(F.sum("d").alias("d"))
                .where(F.col("d") > st.MAX_INTERSECT_DEGREE)
                .select("a").persist())
        timed("2 hubs count (degd agg + deg merge)", hubs.count)
        adjd = (sym_new.groupBy("a")
                .agg(F.collect_list("w").alias("nbrs")).persist())
        timed("3 adjd delta collect_list", adjd.count)
        adj_prior = st._read_batches(
            spark, adj_dir, "a long, nbrs array<long>",
            exclude_key=batch_key)
        adj = (adj_prior.unionByName(adjd).groupBy("a")
               .agg(F.flatten(F.collect_list("nbrs")).alias("nbrs"))
               .persist())
        timed("4 adj flatten-merge", adj.count)
        fast = (
            new.join(adj.select(F.col("a").alias("u"),
                                F.col("nbrs").alias("n_u")), "u")
            .join(adj.select(F.col("a").alias("v"),
                             F.col("nbrs").alias("n_v")), "v")
            .select(F.col("u").alias("a"), F.col("v").alias("b"),
                    F.explode(F.array_intersect("n_u", "n_v")).alias("w"))
        )
        abc = F.array_sort(F.array("a", "b", "w"))
        tris = fast.select(
            abc.getItem(0).alias("ta"), abc.getItem(1).alias("tb"),
            abc.getItem(2).alias("tc")).distinct()
        timed("5 tris closure+distinct+write",
              lambda: tris.write.mode("overwrite").parquet(
                  os.path.join(out_dir, f"batch_key={batch_key}")))
        timed("6 degd write", lambda: degd.write.mode("overwrite")
              .parquet(os.path.join(deg_dir, f"batch_key={batch_key}")))
        timed("7 adjd write", lambda: adjd.write.mode("overwrite")
              .parquet(os.path.join(adj_dir, f"batch_key={batch_key}")))
        timed("8 new write", lambda: new.write.mode("overwrite")
              .parquet(os.path.join(state_dir, f"batch_key={batch_key}")))
        res = st._read_batches(
            spark, out_dir, "ta long, tb long, tc long").distinct()
        timed("9 final distinct+count", res.count)
        print(f"n_new={n_new}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
