#!/usr/bin/env python
"""Streaming state-store measurement at a given SF (round 8, item 4).

Re-runs the SCALING.md round-6 protocol at arbitrary fixture dirs
(notably the generated sf1): a StreamingQueryListener captures
``stateOperators`` rows (numRowsTotal / removed / memoryUsedBytes /
watermark) for every micro-batch of the evicting stream-stream join,
and the CDC apply's external state table is sized on disk. The claim
under test: state is bounded by event-rate x watermark-window (and by
the live-KEY domain for the CDC table), independent of total corpus
size.

Usage: python tools/measure_stream_state.py [--sf-dir /tmp/sfgen/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sfgen/sf1")
    ap.add_argument("--out", default="/tmp/stream_state_r8.json")
    ap.add_argument(
        "--state-store", choices=["hdfs", "rocksdb"], default="hdfs",
        help="state-store provider: 'hdfs' = the default in-JVM-heap "
        "HDFSBackedStateStoreProvider; 'rocksdb' = the off-heap "
        "RocksDB provider (the SCALING.md escape hatch for state "
        "that outgrows executor heap — r8 verdict item 6 asks for "
        "one measured point proving semantic parity + the memory "
        "profile difference)",
    )
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    from rsbsa_etl_spark import params as P
    from rsbsa_etl_spark.session import get_spark
    from rsbsa_etl_spark.sources.fixtures import load
    from rsbsa_etl_spark.streaming.joins import click_view_join_evicting

    spark = get_spark(app_name="rsbsa_stream_state_r8")
    if args.state_store == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    captured: list[dict] = []

    class StateCapture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            for so in p.get("stateOperators", []):
                captured.append(
                    {
                        "batch": p.get("batchId"),
                        "operator": so.get("operatorName"),
                        "numRowsTotal": so.get("numRowsTotal"),
                        "numRowsRemoved": so.get("numRowsRemoved"),
                        "memoryUsedBytes": so.get("memoryUsedBytes"),
                        "watermark": p.get("eventTime", {}).get("watermark"),
                        "inputRows": p.get("numInputRows"),
                        # RocksDB provider reports its real footprint
                        # in customMetrics (memoryUsedBytes is the
                        # JVM-heap view, ~0 for an off-heap store)
                        "custom": {
                            m: v
                            for m, v in (so.get("customMetrics") or {}).items()
                            if m in (
                                "rocksdbTotalMemoryUsageBytes",
                                "rocksdbSstFileSize",
                                "rocksdbPinnedBlocksMemoryUsage",
                            )
                        },
                    }
                )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = StateCapture()
    spark.streams.addListener(listener)
    n_pairs = click_view_join_evicting(
        load(spark, args.sf_dir, "events"),
        delay=f"{P.STREAM_EVICT_DELAY_DAYS} days",
        phase_mod=P.STREAM_EVICT_PHASE_MOD,
    ).count()
    spark.streams.removeListener(listener)

    out = {
        "sf_dir": args.sf_dir,
        "state_store": args.state_store,
        "emitted_pairs": n_pairs,
        "state_batches": captured,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    for row in captured:
        print(row)
    print("emitted pairs:", n_pairs, "->", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
