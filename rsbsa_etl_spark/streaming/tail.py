"""Log tail as a stream (SURVEY §2.8 T3, §2.1 S8).

The reference tails its log file and pushes each parsed line to SSE
clients (``index.js:278-312``). Structured Streaming's file source
is the engine-side equivalent: ``readStream.text(dir)`` discovers
appended files, the same ``parse_log_lines`` transform runs on each
micro-batch, and any sink (memory for tests, ``foreachBatch`` for a
real push fan-out) consumes it.

Checkpointed offsets give exactly-once within the engine — stronger
than the reference's at-least-once rescan (T2,
``models/EtlLogger.js:6-17``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rsbsa_etl_spark.streaming.plan_capture import finish

from rsbsa_etl_spark.functions.textparse import parse_log_lines


def tail_stream(spark: SparkSession, log_dir: str) -> DataFrame:
    """streaming DataFrame of parsed {ts_raw, message} rows from a
    directory of log files."""
    lines = spark.readStream.text(log_dir)
    return parse_log_lines(lines)


def run_tail_once(
    spark: SparkSession, log_dir: str, query_name: str = "tail_once"
) -> DataFrame:
    """drain everything currently in ``log_dir`` through the real
    streaming engine (AvailableNow trigger → memory sink) and return
    the collected batch output as a DataFrame.

    This is the micro-batch path the reference's cron loop
    approximates (T1, ``index.js:75-86``): AvailableNow processes
    all pending input then stops, exactly one "tick".
    """
    q = (
        tail_stream(spark, log_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    finish(q, "tail.run_tail_once")
    return spark.table(query_name)
