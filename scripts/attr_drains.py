"""r19 streaming-drain wall attribution (VERDICT item 5): where does
the wall go in the drain-shaped queries whose executor CPU is a tiny
fraction of their wall (streaming_minhash_dedup, streaming_view_
attribution, stateful_streaming_sessions_evicting, streaming_event_
dedup)? Wraps the drain with a listener capturing every micro-batch's
StreamingQueryProgress durationMs breakdown + walls around the
pre-stream and post-stream phases.

Usage: python scripts/attr_drains.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from mapreduce_experiment_spark.session import get_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or [
        "streaming_minhash_dedup", "streaming_view_attribution",
        "stateful_streaming_sessions_evicting", "streaming_event_dedup",
    ]
    spark = get_session(app_name="attr-drains")
    from pyspark.sql.streaming import StreamingQueryListener

    progress: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            progress.append({"event": "started", "t": time.time()})

        def onQueryProgress(self, e):  # noqa: N802
            p = json.loads(e.progress.json)
            progress.append({"event": "progress", "t": time.time(),
                             "durationMs": p.get("durationMs"),
                             "batchId": p.get("batchId"),
                             "numInputRows": p.get("numInputRows"),
                             "stateOperators": [
                                 {k: so.get(k) for k in
                                  ("operatorName", "numRowsTotal",
                                   "commitTimeMs", "numShufflePartitions",
                                   "numStateStoreInstances")}
                                 for so in p.get("stateOperators", [])]})

        def onQueryTerminated(self, e):  # noqa: N802
            progress.append({"event": "terminated", "t": time.time()})

        def onQueryIdle(self, e):  # noqa: N802
            progress.append({"event": "idle", "t": time.time()})

    spark.streams.addListener(L())
    from mapreduce_experiment_spark.plans.registry import SPECS

    specs = SPECS()
    for name in names:
        progress.clear()
        t0 = time.time()
        df = specs[name].fn(spark, "/root/testdata/sf0.1")
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        time.sleep(1)  # let listener events drain
        print(f"\n=== {name}: build+drain={t1-t0:6.2f}s readback+agg={t2-t1:5.2f}s")
        tprev = t0
        for ev in list(progress):
            if ev["event"] == "progress":
                d = ev["durationMs"] or {}
                so = ev.get("stateOperators") or []
                print(f"  batch {ev['batchId']}: rows={ev['numInputRows']} "
                      f"trigger={d.get('triggerExecution')}ms "
                      f"addBatch={d.get('addBatch')}ms "
                      f"getBatch={d.get('getBatch')}ms "
                      f"latestOffset={d.get('latestOffset')}ms "
                      f"commitOffsets={d.get('commitOffsets')}ms "
                      f"walCommit={d.get('walCommit')}ms "
                      f"(+{ev['t']-tprev:5.2f}s since prev)")
                for s in so:
                    print(f"    state: {s}")
                tprev = ev["t"]
            else:
                print(f"  [{ev['event']}] (+{ev['t']-tprev:5.2f}s)")
                tprev = ev["t"]


if __name__ == "__main__":
    main()
