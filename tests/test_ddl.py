"""K4 DDL surface: idempotent CREATE TABLE IF NOT EXISTS from
declared StructTypes (``ensureTableExists`` parity)."""

from __future__ import annotations

from rsbsa_etl_spark.schemas import FARMER_PROFILE_SCHEMA, PARCEL_SCHEMA
from rsbsa_etl_spark.sources.ddl import ensure_table, schema_to_ddl, table_exists


def test_ensure_table_is_idempotent(spark, tmp_path):
    loc = str(tmp_path / "farmer_profile")
    ensure_table(spark, "farmer_profile_t", FARMER_PROFILE_SCHEMA, location=loc)
    assert table_exists(spark, "farmer_profile_t")
    ensure_table(spark, "farmer_profile_t", FARMER_PROFILE_SCHEMA, location=loc)

    spark.sql(
        "INSERT INTO farmer_profile_t VALUES "
        "('R-1', 'JUAN', 'DELA CRUZ', 'FFRS', 1, DATE'1980-01-01', '012', "
        "12345.67, TIMESTAMP'2024-01-01 00:00:00')"
    )
    rows = spark.sql(
        "SELECT rsbsa_no, first_name, gross_income FROM farmer_profile_t"
    ).collect()
    assert [(r[0], r[1], float(r[2])) for r in rows] == [("R-1", "JUAN", 12345.67)]
    spark.sql("DROP TABLE farmer_profile_t")


def test_schema_ddl_quotes_reserved_words():
    ddl = schema_to_ddl(PARCEL_SCHEMA)
    # 'long' is a reserved-ish identifier the reference must escape
    # (etlService.js:135-138); we quote everything uniformly
    assert "`long` double" in ddl
    assert "`parcel_id` string NOT NULL" in ddl
