"""Structured Streaming surface (SURVEY §2.8): tail source, windowed
aggregations with watermarks, streaming==batch agreement.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rsbsa_etl_spark.schemas import FIXTURE_SCHEMAS
from rsbsa_etl_spark.sources.fixtures import load
from rsbsa_etl_spark.streaming.tail import run_tail_once
from rsbsa_etl_spark.streaming.windows import (
    session_window_stream,
    tumbling_counts,
    tumbling_stream,
)

from tests.conftest import SF_DIR


def test_tail_stream_parses_lines(spark, tmp_path):
    log_dir = str(tmp_path / "logs")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "app.log"), "w") as f:
        f.write(
            "[2025-05-03T10:31:00.800+08:00] Starting ETL. Total records: 8\n"
            "\n"
            "malformed line without timestamp\n"
            "[2025-05-03T10:31:02.081+08:00] ERROR: something failed\n"
        )
    out = run_tail_once(spark, log_dir, query_name="tail_test").collect()
    rows = {r["message"]: r["ts_raw"] for r in out}
    assert len(out) == 3  # blank line dropped (P6)
    assert rows["Starting ETL. Total records: 8"] == "2025-05-03T10:31:00.800+08:00"
    assert rows["malformed line without timestamp"] == "__missing__"  # F9 fallback
    assert rows["ERROR: something failed"] == "2025-05-03T10:31:02.081+08:00"


def _events_stream(spark):
    """events fixture replayed through the real streaming engine
    (file source, one micro-batch via AvailableNow)."""
    batch = load(spark, SF_DIR, "events")
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    return batch, schema


def test_tumbling_stream_matches_batch(spark, tmp_path):
    batch, schema = _events_stream(spark)
    src = str(tmp_path / "events_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        tumbling_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("tumbling_test").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in tumbling_counts(batch)
        .withColumn("window_start", F.timestamp_seconds("window_start"))
        .collect()
    }
    assert got == want


def test_session_window_stream_runs(spark, tmp_path):
    batch, schema = _events_stream(spark)
    src = str(tmp_path / "events_sess")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        session_window_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("session_test").collect()
    assert len(rows) > 0
    # sessions are per-user, bounded, and non-empty
    assert all(r["n_events"] >= 1 for r in rows)
    assert all(r["session_end"] >= r["session_start"] for r in rows)
