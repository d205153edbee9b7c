"""JSONL / CSV ingestion with corrupt-record quarantine.

LLM training corpora arrive overwhelmingly as JSON-Lines (and
secondarily CSV), and at 100 TB the two ingestion disciplines that
matter are:

- **Declared schema, never inference.** ``inferSchema`` /
  ``read_json_auto``-style sampling is a second full scan of the
  data before the first useful byte, and a sampled inference can
  pick a narrower type than a later shard needs. Every reader here
  REQUIRES a schema.
- **PERMISSIVE + corrupt-record capture, quarantine the bad rows.**
  Real crawls contain truncated lines, invalid UTF-8 escapes, and
  schema drift; FAILFAST turns one bad line in shard 40,000 into a
  dead 12-hour job, DROPMALFORMED silently loses data. The default
  here parses what it can, captures the raw text of what it cannot
  into a corrupt column, and ``split_corrupt`` routes the two sides
  (the ingestion twin of the P4 valid/invalid row split,
  operators/filters.py).

Spark caveat encoded here: a query that references ONLY the corrupt
column is rejected by the JSON/CSV relations ("referenced columns
only include the internal corrupt record column"), so
``split_corrupt`` materializes the parse via ``persist()`` before
filtering — documented Spark behavior, not a workaround of ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: default name for the captured-raw-line column
CORRUPT_COL = "_corrupt"


def _with_corrupt(schema: StructType, corrupt_col: str) -> StructType:
    """the user's schema plus the corrupt-capture string column
    (required in the read schema for Spark to populate it)."""
    if corrupt_col in schema.fieldNames():
        return schema
    return StructType([*schema.fields, StructField(corrupt_col, StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = CORRUPT_COL,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """line-delimited JSON with a declared schema; in PERMISSIVE mode
    unparseable lines land raw in ``corrupt_col`` (other fields
    NULL). ``mode="FAILFAST"`` is the strict dial for trusted
    inputs."""
    reader = (
        spark.read.schema(_with_corrupt(schema, corrupt_col))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    corrupt_col: str = CORRUPT_COL,
    mode: str = "PERMISSIVE",
    **options,
) -> DataFrame:
    """CSV with a declared schema (same discipline; a malformed row —
    wrong arity, untypeable cell — lands raw in ``corrupt_col``)."""
    reader = (
        spark.read.schema(_with_corrupt(schema, corrupt_col))
        .option("header", header)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """route a PERMISSIVE parse into (good, quarantine): good rows
    with the capture column dropped, bad rows as (raw_line,) for a
    side sink. Persists the parse first — Spark rejects filters that
    reference only the internal corrupt column on an unmaterialized
    JSON/CSV relation, and the two sides would otherwise re-read the
    files twice anyway.

    Returns ``(good, bad, parsed)`` where ``parsed`` is the persisted
    parse itself: the CALLER owns the release and must
    ``parsed.unpersist()`` once its aggregates (or sink writes) over
    the two sides have materialized — otherwise every invocation
    leaks one cached parse for the session lifetime (r7 advisor)."""
    df = df.persist()
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad, df
