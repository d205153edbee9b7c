"""Stream-stream joins (extension surface — SURVEY §2.8: the
reference's only streaming op is a log tail; event-time stream joins
go beyond parity).

Structured Streaming's stream-stream inner join buffers both sides
in state-store keyed state; the event-time bound plus watermarks is
what lets the engine evict state instead of holding both streams
forever — the knob that makes a 100 TB/day dual-stream join
feasible. Here the join is driven through the REAL engine across a
checkpoint restart, which is the property a batch rewrite cannot
fake: phase 2's left rows can only join right rows recovered from
phase 1's persisted state store.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, functions as F


def click_view_join_replay(
    events: DataFrame,
    lookback: str = "1 hour",
    delay: str = "30 days",
) -> DataFrame:
    """watermarked click↔view interval join across a restart.

    Phase 1 streams only the views (clicks source dir exists but is
    empty): the join emits nothing and commits the buffered view
    rows to the checkpointed state store. Phase 2 adds the clicks
    file and resumes from the same checkpoint — every emitted pair
    (click, view by the same user within ``lookback`` before the
    click) joins against state restored from phase 1.

    With ``delay`` covering the fixture's whole time span no state
    is evicted, so the emitted set equals the batch interval join —
    a pure function of the data that the DuckDB oracle states
    directly. (Shrinking ``delay`` turns on eviction: that behavior
    is deterministic too but its oracle is the engine's eviction
    rule, not a join — kept out of scope.)
    """
    spark = events.sparkSession
    base = tempfile.mkdtemp(prefix="rsbsa_ssj_")
    src_c, src_v = f"{base}/clicks", f"{base}/views"
    ckpt, out = f"{base}/ckpt", f"{base}/out"
    os.makedirs(src_c)
    os.makedirs(src_v)

    proj = events.select("event_id", "ts", "user_id", "event_type")
    schema = "event_id bigint, ts timestamp, user_id bigint"

    def dump(df: DataFrame, dest: str, name: str) -> None:
        tmp = f"{base}/_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{dest}/{name}")
        shutil.rmtree(tmp)

    def run_phase() -> None:
        clicks = (
            spark.readStream.schema(schema)
            .parquet(src_c)
            .withWatermark("ts", delay)
            .alias("c")
        )
        views = (
            spark.readStream.schema(schema)
            .parquet(src_v)
            .withWatermark("ts", delay)
            .alias("v")
        )
        joined = clicks.join(
            views,
            F.expr(
                "c.user_id = v.user_id"
                f" AND v.ts BETWEEN c.ts - INTERVAL {lookback} AND c.ts"
            ),
        ).select(
            F.col("c.event_id").alias("click_id"),
            F.col("v.event_id").alias("view_id"),
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    dump(
        proj.where(F.col("event_type") == "view").drop("event_type"),
        src_v,
        "views.parquet",
    )
    run_phase()
    dump(
        proj.where(F.col("event_type") == "click").drop("event_type"),
        src_c,
        "clicks.parquet",
    )
    run_phase()
    return spark.read.parquet(out).select("click_id", "view_id")
