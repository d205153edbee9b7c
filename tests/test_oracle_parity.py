"""Replicates the driver's correctness gate locally: every
``queries()`` entry vs its DuckDB ``oracle_sql()`` — row count,
column names, order-insensitive value comparison, AND result-type
parity — at sf0.001 (fast) so regressions surface before the driver
runs sf0.01.

The type gate exists because the driver's value hash is *typed*:
round 3's only red (``tpch_q12``) had identical values but DuckDB's
``sum(CASE…)`` returned HUGEINT (int128) where Spark returned BIGINT,
and the hash diverged. ``_canon`` below coerces ints to int64 before
comparing values, which is exactly why the old test missed it — so
``_type_class`` maps both engines' result types onto a shared lattice
(HUGEINT and DECIMAL deliberately do NOT collapse into INT) and any
cross-class pair fails here before the driver ever sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from __spark_entry__ import oracle_sql, queries
from rsbsa_etl_spark.sources.fixtures import FIXTURE_TABLES

from tests.conftest import SF_DIR

ORACLES = oracle_sql()
QUERIES = queries()
CHECKED = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLES)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _spark_type_class(dt) -> str:
    """Collapse a Spark DataType onto the shared type lattice."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "INT"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "FLOAT"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "STRING"
    if isinstance(dt, T.BooleanType):
        return "BOOL"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.ArrayType):
        return f"LIST<{_spark_type_class(dt.elementType)}>"
    if isinstance(dt, T.BinaryType):
        return "BINARY"
    if isinstance(dt, T.MapType):
        return "MAP"
    if isinstance(dt, T.StructType):
        return "STRUCT"
    return str(dt)


def _duck_type_class(name: str) -> str:
    """Collapse a DuckDB type name onto the shared type lattice.

    HUGEINT/UBIGINT intentionally map to their own class (they exceed
    int64, and the driver's typed hash treats them differently from
    BIGINT), so an oracle producing one fails against a Spark LongType
    column instead of silently "matching" after int64 coercion.
    """
    s = str(name).upper()
    if s.endswith("[]"):
        return f"LIST<{_duck_type_class(s[:-2])}>"
    if s.startswith("DECIMAL"):
        return s.replace(" ", "")
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT"
    if s in ("HUGEINT", "UHUGEINT", "UBIGINT"):
        return "INT128"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "FLOAT"
    if s in ("VARCHAR", "TEXT", "STRING"):
        return "STRING"
    if s == "BOOLEAN":
        return "BOOL"
    if s == "DATE":
        return "DATE"
    if s.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if s in ("BLOB", "BYTEA", "BINARY"):
        return "BINARY"
    if s.startswith("MAP"):
        return "MAP"
    if s.startswith("STRUCT"):
        return "STRUCT"
    return s


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1).copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype(float).round(9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_types = {f.name: _spark_type_class(f.dataType) for f in sdf.schema.fields}
    got = sdf.toPandas()
    con = duck_con(SF_DIR)
    rel = con.sql(ORACLES[name])
    duck_types = dict(zip(rel.columns, (_duck_type_class(t) for t in rel.types)))
    want = rel.df()
    con.close()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    drift = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if c in duck_types and spark_types[c] != duck_types[c]
    }
    assert not drift, (
        f"{name}: result-type drift (spark vs duckdb) {drift} — the driver's "
        f"typed hash will mismatch even when values agree; CAST in the oracle"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


if ROWS_ONLY:

    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_queries_run(spark, name):
        df = QUERIES[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0
        assert len(df.schema.fields) > 0

else:

    def test_every_query_is_value_checked():
        """since round 5 (stream_tail gained a SQL oracle) every
        registered query has a DuckDB oracle — keep it that way; a
        new rows-only key should be a deliberate decision, not an
        oversight."""
        assert ROWS_ONLY == []
