"""Replicates the driver's correctness gate locally: every
``queries()`` entry vs its DuckDB ``oracle_sql()`` — row count,
column names, and order-insensitive value comparison — at sf0.001
(fast) so regressions surface before the driver runs sf0.01.
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
    got = QUERIES[name](spark, SF_DIR).toPandas()
    con = duck_con(SF_DIR)
    want = con.execute(ORACLES[name]).df()
    con.close()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
