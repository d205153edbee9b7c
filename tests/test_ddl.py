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


# ---------------------------------- full 12-table inventory (K4 parity)

import pytest
from pyspark.sql import functions as F, types as T

from rsbsa_etl_spark.operators.filters import check_domains, zerofill_format
from rsbsa_etl_spark.schemas import (
    DOMAIN_TABLES,
    ENUM_DOMAINS,
    ZEROFILL_WIDTHS,
)


def test_inventory_matches_reference_ddl_count():
    """the reference manages exactly 12 target tables
    (etlService.js:244-591); the inventory must stay complete."""
    assert len(DOMAIN_TABLES) == 12
    assert sorted(DOMAIN_TABLES) == [
        "farmers_attachments", "farmers_fca", "farmers_form_attachments",
        "farmers_kyc1", "farmers_kyc2", "farmers_kyc3", "farmers_kyc4",
        "farmers_livelihood", "farmparcel", "farmparcelactivity",
        "farmparcelattachments", "farmparcelownership",
    ]
    # spot-pin the widest tables' column counts against the DDL
    assert len(DOMAIN_TABLES["farmers_kyc1"].fields) == 51
    assert len(DOMAIN_TABLES["farmers_kyc4"].fields) == 46
    assert len(DOMAIN_TABLES["farmparcel"].fields) == 37


def _sample_value(f: T.StructField):
    """one in-domain literal per type (ENUM columns get a legal
    member, ZEROFILL codes a width-conformant digit string)."""
    if isinstance(f.dataType, T.LongType):
        return 1
    if isinstance(f.dataType, T.IntegerType):
        return 2
    if isinstance(f.dataType, T.ByteType):
        return 1
    if isinstance(f.dataType, T.DecimalType):
        from decimal import Decimal

        return Decimal("12.34")
    if isinstance(f.dataType, T.DoubleType):
        return 7.5
    if isinstance(f.dataType, T.DateType):
        import datetime

        return datetime.date(2024, 1, 1)
    if isinstance(f.dataType, T.TimestampType):
        import datetime

        return datetime.datetime(2024, 1, 1, 0, 0, 0)
    return "X"


@pytest.mark.parametrize("table", sorted(DOMAIN_TABLES))
def test_ensure_table_roundtrips_every_inventory_table(
    spark, tmp_path, table
):
    """all 12 DDL bodies: create-if-not-exists (idempotent), insert
    one fully-typed row, read it back through the catalog."""
    schema = DOMAIN_TABLES[table]
    tname = f"ddl_{table}"
    loc = str(tmp_path / table)
    ensure_table(spark, tname, schema, location=loc)
    ensure_table(spark, tname, schema, location=loc)  # idempotent
    assert table_exists(spark, tname)

    row = {}
    for f in schema.fields:
        v = _sample_value(f)
        if (table, f.name) in ENUM_DOMAINS:
            v = ENUM_DOMAINS[(table, f.name)][0]
        elif (table, f.name) in ZEROFILL_WIDTHS:
            v = "0" * (ZEROFILL_WIDTHS[(table, f.name)] - 1) + "7"
        row[f.name] = v
    spark.createDataFrame([row], schema).write.mode("append").insertInto(
        tname
    )
    got = spark.table(tname).collect()
    assert len(got) == 1
    assert got[0][schema.fields[0].name] == 1 or isinstance(
        got[0][schema.fields[0].name], str
    )
    spark.sql(f"DROP TABLE `{tname}`")


def test_check_domains_flags_enum_and_zerofill_violations(spark):
    schema = DOMAIN_TABLES["farmers_kyc4"]
    cols = ["kyc4_id", "rsbsa_no", "deceased", "validated"]
    sub = T.StructType([schema[c] for c in cols])
    df = spark.createDataFrame(
        [
            (1, "R-1", "1", "2"),      # all legal
            (2, "R-2", "maybe", "1"),  # deceased outside ENUM('1','0')
            (3, "R-3", None, "9"),     # NULL passes; validated illegal
        ],
        sub,
    )
    got = {
        r["kyc4_id"]: (r["_chk_deceased"], r["_chk_validated"], r["_valid"])
        for r in check_domains(df, "farmers_kyc4").collect()
    }
    assert got[1] == (True, True, True)
    assert got[2] == (False, True, False)
    assert got[3] == (True, False, False)


def test_zerofill_format_pads_geo_codes(spark):
    df = spark.createDataFrame(
        [("P-1", "7", "1"), ("P-2", None, "12"), ("P-3", "1234", "999")],
        ["parcel_id", "bgy", "mun"],
    )
    got = {
        r["parcel_id"]: (r["bgy"], r["mun"])
        for r in zerofill_format(df, "farmparcel").collect()
    }
    assert got["P-1"] == ("007", "01")
    assert got["P-2"] == (None, "12")
    # MySQL ZEROFILL never truncates: over-width values pass through
    assert got["P-3"] == ("1234", "999")


def test_check_domains_and_zerofill_format_agree_on_overwidth(spark):
    """MySQL display width is a rendering hint, not a storage
    constraint: a digits-only geo code LONGER than its DDL width must
    be VALID to check_domains AND pass through zerofill_format
    unchanged — the two ops may not disagree on the same value
    (non-digits stay invalid)."""
    df = spark.createDataFrame(
        [("P-1", "1234"), ("P-2", "12x4")], ["parcel_id", "bgy"]
    )
    chk = {
        r["parcel_id"]: r["_chk_bgy"]
        for r in check_domains(df, "farmparcel").collect()
    }
    assert chk["P-1"] is True   # over-width but digits-only: legal
    assert chk["P-2"] is False  # non-digits: still invalid
    fmt = {
        r["parcel_id"]: r["bgy"]
        for r in zerofill_format(df, "farmparcel").collect()
    }
    assert fmt["P-1"] == "1234"  # never truncated


def test_check_domains_enforces_integer_storage_range(spark):
    """display width is a rendering hint, but the DDL's integer TYPE
    is a hard bound: bgy1 is TINYINT(3) UNSIGNED ZEROFILL
    (etlService.js:537), so digits-only values above 255 can never
    exist in the reference and must flag invalid — while bgy is
    INT(3) UNSIGNED (js:542), so the same '1234' is legal there
    (r7 advisor)."""
    df = spark.createDataFrame(
        [
            ("P-1", "255", "1234"),   # both at/inside their ranges
            ("P-2", "256", "1234"),   # bgy1 exceeds TINYINT UNSIGNED
            ("P-3", "1234", "7"),     # over-width AND over-range
            ("P-4", "007", None),     # zero-padded in range; NULL ok
            ("P-5", "9" * 25, "7"),   # absurd length: no NULL poison
        ],
        ["parcel_id", "bgy1", "bgy"],
    )
    got = {
        r["parcel_id"]: (r["_chk_bgy1"], r["_chk_bgy"])
        for r in check_domains(df, "farmparcel").collect()
    }
    assert got["P-1"] == (True, True)
    assert got["P-2"] == (False, True)
    assert got["P-3"] == (False, True)
    assert got["P-4"] == (True, True)
    # >18 digits must be a deterministic False, never NULL
    assert got["P-5"] == (False, True)


def test_check_domains_covers_every_registered_constraint():
    """every ENUM/ZEROFILL registry entry points at a real column of
    its table's declared schema — no orphaned constraints."""
    for (tbl, col) in list(ENUM_DOMAINS) + list(ZEROFILL_WIDTHS):
        assert col in DOMAIN_TABLES[tbl].fieldNames(), (tbl, col)
