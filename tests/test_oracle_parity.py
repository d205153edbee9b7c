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

import pandas as pd
import pytest

from __spark_entry__ import oracle_sql, queries

# the comparator is the engine's own (rsbsa_etl_spark/verify.py) —
# the SAME code behind `python -m rsbsa_etl_spark verify`, so the
# pytest sweep and the CLI gate cannot drift
from rsbsa_etl_spark.verify import (
    canon as _canon,
    duck_con,
    duck_type_class as _duck_type_class,
    spark_type_class as _spark_type_class,
)

from tests.conftest import SF_DIR

ORACLES = oracle_sql()
QUERIES = queries()
CHECKED = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLES)


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
