"""Source/format round-trips beyond parquet and text (SURVEY §2.1):
the engine must be able to land and re-read its tables in the
interchange formats a migration actually meets (CSV exports, JSON
event dumps, ORC warehouses). Schema is always declared on read —
inference is a full extra pass at 100 TB and type-lossy for CSV."""

from __future__ import annotations

from pyspark.sql import functions as F

from rsbsa_etl_spark.sources.fixtures import load

from tests.conftest import SF_DIR


def _events_projected(spark):
    # timestamps rendered to epoch micros: CSV/JSON round-trip of raw
    # timestamps is format- and timezone-lossy, epochs are not
    return (
        load(spark, SF_DIR, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("ts_us"),
        )
    )


def _assert_roundtrip(df, back):
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    df = _events_projected(spark)
    path = str(tmp_path / "ev_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema(
            "event_id bigint, user_id bigint, event_type string,"
            " value double, ts_us bigint"
        )
        .option("header", True)
        .csv(path)
    )
    _assert_roundtrip(df, back)


def test_json_roundtrip_with_declared_schema(spark, tmp_path):
    df = _events_projected(spark)
    path = str(tmp_path / "ev_json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string,"
        " value double, ts_us bigint"
    ).json(path)
    _assert_roundtrip(df, back)


def test_orc_roundtrip(spark, tmp_path):
    df = _events_projected(spark)
    path = str(tmp_path / "ev_orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    _assert_roundtrip(df, back)


def test_orc_pushes_filters_like_parquet(spark, tmp_path):
    df = _events_projected(spark)
    path = str(tmp_path / "ev_orc2")
    df.write.mode("overwrite").orc(path)
    scan = spark.read.orc(path).where(F.col("event_id") < 100)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(event_id,100)" in plan


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """§1.3 schema evolution: a column added mid-stream must surface
    via mergeSchema as the union schema, with NULLs for files written
    before the column existed — the append-only evolution story of a
    long-lived 100 TB table (mergeSchema stays opt-in: footer-merging
    every file on every read is an O(files) planning cost)."""
    base = str(tmp_path / "evo")
    old = _events_projected(spark).select("event_id", "user_id")
    new = _events_projected(spark).select(
        "event_id", "user_id", F.lit("v2").alias("source_tag")
    )
    old.write.mode("overwrite").parquet(base + "/d=1")
    new.write.mode("overwrite").parquet(base + "/d=2")

    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"event_id", "user_id", "source_tag", "d"}
    n = _events_projected(spark).count()
    assert merged.count() == 2 * n
    assert merged.where(F.col("source_tag").isNull()).count() == n
    assert merged.where(F.col("source_tag") == "v2").count() == n
