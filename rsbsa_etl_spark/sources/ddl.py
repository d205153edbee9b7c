"""DDL surface (SURVEY §2.1 K4): engine-managed target tables.

The reference runs ``CREATE TABLE IF NOT EXISTS`` before every load
(``services/etlService.js:43``, dispatch ``:203-242``, 12 DDL bodies
``:244-591``). Spark's catalog form: render the declared StructType
to a column list and issue ``CREATE TABLE IF NOT EXISTS … USING
parquet [LOCATION …]`` — idempotent, and the single source of truth
stays ``schemas.py`` (no hand-maintained SQL strings).

External LOCATION keeps data layout under the caller's control (the
keyed-bucket layout of ``sources.sinks`` can be registered as a
table and then queried/pruned through the catalog).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def schema_to_ddl(schema: T.StructType) -> str:
    """render a StructType as a CREATE TABLE column list; reserved
    words (``table``, ``long`` — F3, ``etlService.js:135-138``) are
    backtick-quoted."""
    cols = []
    for f in schema.fields:
        nullability = "" if f.nullable else " NOT NULL"
        cols.append(f"`{f.name}` {f.dataType.simpleString()}{nullability}")
    return ", ".join(cols)


def ensure_table(
    spark: SparkSession,
    name: str,
    schema: T.StructType,
    location: str | None = None,
    partition_by: tuple[str, ...] = (),
) -> None:
    """K4: idempotent CREATE TABLE IF NOT EXISTS from a declared
    schema (``ensureTableExists``, ``etlService.js:203-242``)."""
    loc = f" LOCATION '{location}'" if location else ""
    part = (
        " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_by) + ")"
        if partition_by
        else ""
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{name}` ({schema_to_ddl(schema)})"
        f" USING parquet{part}{loc}"
    )


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)
