"""r19 span-family A/B (VERDICT item 7): the window-fingerprint table
``fpw`` feeds BOTH the repeat aggregate and the flagging join; the
shipped code RECOMPUTES it per consumer (documented 100 TB trade:
one extra map-side pass beats materializing a corpus-scale
intermediate). This measures that trade at sf0.1 and at a 10x corpus:

  A  recompute (shipped)
  B  eager localCheckpoint of fpw shared by both consumers

Usage: python scripts/attr_spans.py [--x10]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from bench import _stage_delta, _stage_snapshot  # noqa: E402
from mapreduce_experiment_spark.session import get_session  # noqa: E402


def main() -> None:
    x10 = "--x10" in sys.argv
    spark = get_session(app_name="attr-spans")
    from pyspark.sql import functions as F

    from mapreduce_experiment_spark.operators.dedup import (
        SPAN_N, _merge_islands, span_window_fingerprints,
    )
    from mapreduce_experiment_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    if x10:
        copies = [docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            "text") for i in range(10)]
        d = copies[0]
        for c in copies[1:]:
            d = d.unionByName(c)
        path = "/tmp/spans_x10.parquet"
        if not os.path.exists(path):
            d.write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)

    def timed(label, fn):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        b = _stage_snapshot(spark)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        d = _stage_delta(b, _stage_snapshot(spark))
        print(f"{label:34s} wall={dt:7.2f}s cpu={d['executor_cpu_time_ms']/1e3:7.2f}s "
              f"shW={d['shuffle_write_bytes']/1e6:8.2f}MB "
              f"spill={d['memory_spill_bytes']/1e6:.0f}MB", flush=True)
        spark.sparkContext.setJobDescription(None)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def repeated_spans_a(docs):
        fpw = span_window_fingerprints(docs, SPAN_N, "doc_id", "text")
        rep = (fpw.groupBy("fp")
               .agg(F.count_distinct("doc_id").alias("n_docs"))
               .where(F.col("n_docs") >= 2).select("fp"))
        return _merge_islands(fpw.join(rep, "fp"), SPAN_N)

    def repeated_spans_b(docs):
        fpw = span_window_fingerprints(docs, SPAN_N, "doc_id", "text") \
            .localCheckpoint(eager=True)
        rep = (fpw.groupBy("fp")
               .agg(F.count_distinct("doc_id").alias("n_docs"))
               .where(F.col("n_docs") >= 2).select("fp"))
        return _merge_islands(fpw.join(rep, "fp"), SPAN_N)

    for _ in range(2):
        timed("A repeated_spans recompute", lambda: noop(repeated_spans_a(docs)))
        timed("B repeated_spans ckpt fpw", lambda: noop(repeated_spans_b(docs)))


if __name__ == "__main__":
    main()
