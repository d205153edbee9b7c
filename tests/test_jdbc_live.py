"""Flag-gated LIVE JDBC round-trip (r12 verdict item 5).

No JDBC driver or database ships in this container, so the JDBC
module's standing coverage is option-construction and SQL-string
unit tests (tests/test_plans.py). This test closes the remaining
gap — the upsert statement getting an EXECUTION, not just a string
assertion — whenever a real MySQL/MariaDB is reachable:

    export SPARK_GRAFT_JDBC_URL=jdbc:mysql://host:3306/db
    export SPARK_GRAFT_JDBC_USER=...
    export SPARK_GRAFT_JDBC_PASSWORD=...
    export SPARK_GRAFT_JDBC_JAR=/path/to/mysql-connector-j.jar
    python -m pytest tests/test_jdbc_live.py -q

Unset, it SKIPS (the documented gap — see README "JDBC coverage").
The round trip exercised: create target with a PRIMARY KEY →
bulk-append seed rows → write_jdbc(mode='upsert') stages the
changed+new rows in parallel and returns the ON DUPLICATE KEY
statement → execute it on the target over the JVM's DriverManager →
read_table back and assert the merge semantics (updated values win,
new keys inserted, untouched keys intact) — including a reserved
identifier (``group``) through the escaping path.
"""

from __future__ import annotations

import os

import pytest

URL = os.environ.get("SPARK_GRAFT_JDBC_URL")
JAR = os.environ.get("SPARK_GRAFT_JDBC_JAR")

pytestmark = pytest.mark.skipif(
    not URL,
    reason="SPARK_GRAFT_JDBC_URL not set — live JDBC smoke needs a "
    "reachable MySQL/MariaDB (see module docstring)",
)


@pytest.fixture(scope="module")
def jdbc_spark():
    """a session with the connector jar on the JVM classpath —
    separate from the shared test session because jars must be
    configured before the JVM starts."""
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[4]")
        .appName("jdbc-live-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if JAR:
        b = b.config("spark.jars", JAR)
    spark = b.getOrCreate()
    yield spark
    spark.stop()


def _endpoint():
    from rsbsa_etl_spark.sources.jdbc import JdbcEndpoint

    return JdbcEndpoint(
        url=URL,
        user=os.environ.get("SPARK_GRAFT_JDBC_USER", "root"),
        password=os.environ.get("SPARK_GRAFT_JDBC_PASSWORD", ""),
        driver=os.environ.get(
            "SPARK_GRAFT_JDBC_DRIVER", "com.mysql.cj.jdbc.Driver"
        ),
    )


def _exec_sql(spark, ep, *statements: str) -> None:
    """run DDL/DML on the target through the JVM's DriverManager —
    the same classpath the JDBC writes use, so no Python-side driver
    is needed."""
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        ep.url, ep.user, ep.password
    )
    try:
        st = conn.createStatement()
        for sql in statements:
            st.execute(sql)
        st.close()
    finally:
        conn.close()


def test_upsert_round_trip_executes_for_real(jdbc_spark):
    from rsbsa_etl_spark.sources.jdbc import read_table, write_jdbc

    ep = _endpoint()
    table = "spark_graft_live_smoke"
    _exec_sql(
        jdbc_spark,
        ep,
        f"DROP TABLE IF EXISTS {table}",
        f"DROP TABLE IF EXISTS {table}__stage",
        # reserved identifier `group` exercises the escaping path
        f"CREATE TABLE {table} ("
        "  rsbsa_no VARCHAR(32) PRIMARY KEY,"
        "  first_name VARCHAR(64),"
        "  `group` VARCHAR(16),"
        "  amount BIGINT)",
    )
    try:
        seed = jdbc_spark.createDataFrame(
            [("R1", "ana", "a", 10), ("R2", "ben", "b", 20)],
            "rsbsa_no string, first_name string, group string, amount long",
        )
        write_jdbc(seed, ep, table, mode="append")

        # R2 changes, R3 is new, R1 untouched
        delta = jdbc_spark.createDataFrame(
            [("R2", "ben", "b2", 25), ("R3", "cyn", "c", 30)],
            "rsbsa_no string, first_name string, group string, amount long",
        )
        stmt = write_jdbc(delta, ep, table, mode="upsert")
        assert stmt is not None and "ON DUPLICATE KEY UPDATE" in stmt
        _exec_sql(jdbc_spark, ep, stmt)

        got = {
            r["rsbsa_no"]: (r["first_name"], r["group"], r["amount"])
            for r in read_table(jdbc_spark, ep, table).collect()
        }
        assert got == {
            "R1": ("ana", "a", 10),      # untouched key intact
            "R2": ("ben", "b2", 25),     # matched key updated
            "R3": ("cyn", "c", 30),      # new key inserted
        }
    finally:
        _exec_sql(
            jdbc_spark,
            ep,
            f"DROP TABLE IF EXISTS {table}",
            f"DROP TABLE IF EXISTS {table}__stage",
        )
