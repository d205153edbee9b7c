"""Declared StructTypes.

Two schema families:

1. **Fixture tables** (``/root/testdata/sf*/*.parquet``) — the
   TPC-H-ish corpus every ``queries()`` entry runs on. Types verified
   against the parquet footers (FIXTURES.md).

2. **Reference-domain tables** — distilled from the reference's
   target DDL (``services/etlService.js:244-591``): the change-log
   (``models/EtlLogger.js:6-17``), a one-to-one profile table
   (K2 upsert path), a bridge table + parcel table (J1 two-step
   join), and a one-to-many table (K3 delete+insert path). Used by
   the incremental-sync pipeline tests (SURVEY §3.1).

The reference infers schemas from the first row of each batch
(``etlService.js:119,134``); declaring them is the 100 TB fix
(SURVEY §7.3.5) — ragged rows fail fast instead of silently
generating wrong DML.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- fixtures

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # stored as Timestamp(MICROS, isAdjustedToUTC=false) —
            # read as NTZ (exact parquet semantics); the loader casts
            # to session-TZ timestamp (UTC) for downstream queries
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# ------------------------------------------------- reference-domain tables

#: change-log / CDC table — mirrors ``etl_logger_profiling``
#: (columns per ``models/EtlLogger.js:8-9``). ``table`` is a reserved
#: word in some dialects (the reference backtick-quotes it,
#: ``EtlLogger.js:9``); Spark handles quoting natively.
CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("log_id", T.LongType(), False),
        T.StructField("rsbsa_no", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
    ]
)

#: one-to-one profile table — distilled from ``farmers_kyc1`` DDL
#: (``services/etlService.js:244-301``). Upsert path (K2).
FARMER_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("rsbsa_no", T.StringType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("surname", T.StringType(), True),
        T.StructField("data_source", T.StringType(), True),  # ENUM domain, §1.2
        T.StructField("sex", T.IntegerType(), True),  # TINYINT(1) bool-ish
        T.StructField("birthday", T.DateType(), True),
        T.StructField("brgy", T.StringType(), True),  # ZEROFILL geo code
        T.StructField("gross_income", T.DecimalType(10, 2), True),
        T.StructField("c_date", T.TimestampType(), True),
    ]
)

#: bridge table — ``farmparcelownership`` (``etlService.js:575-591``);
#: many-to-many farmer↔parcel, drives the two-step join (J1).
PARCEL_OWNERSHIP_SCHEMA = T.StructType(
    [
        T.StructField("farmown_id", T.LongType(), False),
        T.StructField("parcel_id", T.StringType(), True),
        T.StructField("rsbsa_no", T.StringType(), True),
        T.StructField("own_status", T.StringType(), True),
        T.StructField("date_created", T.TimestampType(), True),
    ]
)

#: parcel table — ``farmparcel`` (``etlService.js:530-573``);
#: delete+insert path (K3), reached only via the bridge.
#: ``long`` is a reserved-word column (F3, ``etlService.js:135-138``).
PARCEL_SCHEMA = T.StructType(
    [
        T.StructField("parcel_id", T.StringType(), False),
        T.StructField("desc_location", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("long", T.DoubleType(), True),
        T.StructField("farm_area", T.DecimalType(10, 4), True),
        T.StructField("active", T.StringType(), True),  # ENUM {'1','0'}
        T.StructField("date_created", T.TimestampType(), True),
    ]
)

#: one-to-many table — ``farmers_livelihood`` (``etlService.js:468-480``).
LIVELIHOOD_SCHEMA = T.StructType(
    [
        T.StructField("farmlivelihood_id", T.LongType(), False),
        T.StructField("rsbsa_no", T.StringType(), True),
        T.StructField("livelihood", T.StringType(), True),
        T.StructField("activity_work", T.StringType(), True),
        T.StructField("active", T.StringType(), True),
    ]
)

#: tables synced one-to-one (upsert) vs one-to-many (overwrite) —
#: mirrors ``ONE_TO_ONE_TABLES`` (``etlService.js:10-12``).
ONE_TO_ONE_TABLES = frozenset(
    {"farmers_kyc1", "farmers_kyc2", "farmers_kyc3", "farmers_kyc4", "farmer_profile"}
)
