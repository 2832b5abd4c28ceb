"""r19 attribution for streaming_triangle_count (VERDICT item 1).

Replays the registered query's exact 3-file micro-batch split by
calling streaming.triangles._process_batch directly (no Structured
Streaming machinery), with a stage-metric snapshot around EVERY
driver action inside each batch — so the per-batch CPU decomposes
into: state read + anti-join (new persist), hub-degree count,
closure + triangle write, state-delta write, final distinct.

Usage: python scripts/attr_streamtri.py [--sf-dir /root/testdata/sf0.1]
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
    ap.add_argument("--mode", default="replay",
                    choices=["replay", "full"],
                    help="replay = per-batch attribution via "
                         "_process_batch; full = run the registered "
                         "query end-to-end with one snapshot")
    args = ap.parse_args()

    spark = get_session(app_name="attr-streamtri")
    from pyspark.sql import functions as F  # noqa: F401

    from mapreduce_experiment_spark.plans.queries_graph import derive_edges
    from mapreduce_experiment_spark.streaming import triangles as st

    def timed(label: str, fn):
        spark.sparkContext.setJobDescription(label)
        before = _stage_snapshot(spark)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        delta = _stage_delta(before, _stage_snapshot(spark))
        print(f"{label:42s} wall={dt:7.2f}s cpu={delta['executor_cpu_time_ms']/1e3:7.2f}s "
              f"shW={delta['shuffle_write_bytes']/1e6:8.2f}MB "
              f"spill={delta['memory_spill_bytes']/1e6:.0f}MB", flush=True)
        spark.sparkContext.setJobDescription(None)
        return out

    work = tempfile.mkdtemp(prefix="attr_stri_")
    try:
        edges_dir = f"{work}/edges_in"
        timed("derive_edges -> 3-file write", lambda: derive_edges(
            spark, args.sf_dir).repartition(3).write.parquet(edges_dir))

        if args.mode == "full":
            tris = timed("streaming_triangles (all batches)",
                         lambda: st.streaming_triangles(
                             spark, edges_dir, work))
            n = timed("final distinct+count", tris.count)
            print(f"n_triangles = {n}")
            return

        state_dir = os.path.join(work, "edge_state")
        out_dir = os.path.join(work, "triangles_out")
        files = sorted(
            f for f in os.listdir(edges_dir) if f.endswith(".parquet"))
        for i, fname in enumerate(files):
            batch = spark.read.schema(st._EDGE_SCHEMA).parquet(
                os.path.join(edges_dir, fname))
            timed(f"batch {i}: _process_batch",
                  lambda b=batch, k=f"r0b{i}": st._process_batch(
                      b, k, state_dir, out_dir))
        res = st._read_batches(
            spark, out_dir, "ta long, tb long, tc long").distinct()
        n = timed("final distinct+count", res.count)
        print(f"n_triangles = {n}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
