"""r19 fine-grained attribution INSIDE one streaming-triangles batch:
replays batches 0..k-1 via _process_batch to build real state, then
re-executes batch k's internals step by step, materializing each
stage with the noop sink behind its own stage-metric snapshot.

Usage: python scripts/attr_streamtri2.py [--sf-dir ...] [--k 2]
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

    spark = get_session(app_name="attr-streamtri2")
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
        print(f"{label:44s} wall={dt:7.2f}s cpu={delta['executor_cpu_time_ms']/1e3:7.2f}s "
              f"shW={delta['shuffle_write_bytes']/1e6:8.2f}MB", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    work = tempfile.mkdtemp(prefix="attr_stri2_")
    try:
        edges_dir = f"{work}/edges_in"
        derive_edges(spark, args.sf_dir).repartition(3) \
            .write.parquet(edges_dir)
        state_dir = os.path.join(work, "edge_state")
        out_dir = os.path.join(work, "triangles_out")
        files = sorted(
            f for f in os.listdir(edges_dir) if f.endswith(".parquet"))
        for i in range(args.k):
            batch = spark.read.schema(st._EDGE_SCHEMA).parquet(
                os.path.join(edges_dir, files[i]))
            st._process_batch(batch, f"r0b{i}", state_dir, out_dir)
        print(f"--- dissecting batch {args.k} ---")
        batch = spark.read.schema(st._EDGE_SCHEMA).parquet(
            os.path.join(edges_dir, files[args.k]))
        batch_key = f"r0b{args.k}"

        new = canonical_edges(batch)
        state = st._read_batches(spark, state_dir, "u long, v long",
                                 exclude_key=batch_key)
        new = new.join(state, ["u", "v"], "left_anti").persist()
        n_new = timed("1 anti-join: new persist+count", new.count)
        all_edges = state.unionByName(new).persist()
        sym = all_edges.select(F.col("u").alias("a"), F.col("v").alias("w")) \
            .unionByName(all_edges.select(F.col("v").alias("a"),
                                          F.col("u").alias("w")))
        big = (sym.groupBy("a").agg(F.count(F.lit(1)).alias("_d"))
               .where(F.col("_d") > st.MAX_INTERSECT_DEGREE)
               .select("a").persist())
        timed("2 hub-degree count (materializes unions)", big.count)
        adj = (sym.groupBy("a").agg(F.collect_list("w").alias("nbrs"))
               .persist())
        timed("3 adj collect_list build", adj.count)
        fast = (
            new.join(adj.select(F.col("a").alias("u"),
                                F.col("nbrs").alias("n_u")), "u")
            .join(adj.select(F.col("a").alias("v"),
                             F.col("nbrs").alias("n_v")), "v")
            .select(F.col("u").alias("a"), F.col("v").alias("b"),
                    F.explode(F.array_intersect("n_u", "n_v")).alias("w"))
        )
        timed("4 fast join+intersect+explode (noop)", lambda: noop(fast))
        abc = F.array_sort(F.array("a", "b", "w"))
        tris = fast.select(
            abc.getItem(0).alias("ta"), abc.getItem(1).alias("tb"),
            abc.getItem(2).alias("tc"))
        timed("5 + array_sort proj (noop)", lambda: noop(tris))
        trid = tris.distinct()
        timed("6 + distinct (noop)", lambda: noop(trid))
        timed("7 tris write parquet", lambda: trid.write.mode("overwrite")
              .parquet(os.path.join(out_dir, f"batch_key={batch_key}")))
        timed("8 new write parquet", lambda: new.write.mode("overwrite")
              .parquet(os.path.join(state_dir, f"batch_key={batch_key}")))
        res = st._read_batches(
            spark, out_dir, "ta long, tb long, tc long").distinct()
        timed("9 final distinct+count", res.count)
        print(f"n_new={n_new}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
