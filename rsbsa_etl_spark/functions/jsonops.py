"""JSON scalar functions (SURVEY §2.7 F11).

The reference serializes records/errors to JSON strings for logs and
SSE (``index.js:287,301``; ``services/etlService.js:676,683``). The
engine adds the inverse (parse) for the ``events.props`` JSON column
— the extension surface's entry point for semi-structured data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def parse_props(df: DataFrame, col: str = "props", schema: str = "k BIGINT") -> DataFrame:
    """``from_json`` with a declared schema — no schema inference at
    scale (inference = an extra full scan)."""
    return df.withColumn("props_struct", F.from_json(F.col(col), schema))


def to_json_struct(*cols: str) -> Column:
    """F11: serialize selected columns as a JSON object."""
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def json_get(col: Column, field: str) -> Column:
    """Scalar field extraction without full parse — ``get_json_object``
    is codegen'd and cheap for single-field pulls."""
    return F.get_json_object(col, f"$.{field}")
