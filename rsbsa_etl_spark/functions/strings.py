"""String transforms + the per-table transform-rule registry
(SURVEY §2.7 F1/F2/F8).

The reference's transform engine is a per-table whitelist of string
columns that get uppercased row-by-row in JS
(``services/etlService.js:148-201``). Here the registry is
config-data (table → column list) and the transform is a whole-column
``F.upper`` — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

#: per-table uppercase column lists — mirrors the field lists at
#: ``services/etlService.js:148-191`` for the distilled fixture
#: tables (FIXTURES.md §4) plus fixture-table analogs.
UPPERCASE_RULES: dict[str, tuple[str, ...]] = {
    "farmer_profile": ("first_name", "surname"),
    "parcel": ("desc_location",),
    "livelihood": ("livelihood", "activity_work"),
    "customer": ("c_name", "c_mktsegment"),
    "part": ("p_name", "p_brand"),
}


def uppercase_fields(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """F1: uppercase the listed string columns; nulls and unlisted
    columns pass through (``etlService.js:193-201`` — its
    ``typeof === 'string'`` guard is the schema's job here)."""
    out = df
    for c in columns:
        out = out.withColumn(c, F.upper(F.col(c)))
    return out


def apply_table_rules(
    df: DataFrame, table: str, rules: Mapping[str, Sequence[str]] = UPPERCASE_RULES
) -> DataFrame:
    """F2: per-table dispatch; unknown tables pass through unchanged
    (``etlService.js:188-189``)."""
    return uppercase_fields(df, rules.get(table, ()))


def concat_key(df: DataFrame, cols: Sequence[str], out: str = "composite_key") -> DataFrame:
    """F8: composite key build ```${table}:${rsbsa_no}``` —
    ``etlService.js:620``."""
    return df.withColumn(out, F.concat_ws(":", *[F.col(c) for c in cols]))


def split_key(df: DataFrame, key_col: str, idx: int, out: str) -> DataFrame:
    """F8: ``key.split(':')[idx]`` — ``etlService.js:628``."""
    return df.withColumn(out, F.split(F.col(key_col), ":").getItem(idx))
