"""JDBC source/sink wiring (SURVEY §2.1 S1 source side; §1.1 pools).

The reference holds two mysql2 pools — source and target
(``config/db.js:5-19,21-35``, 10 connections each) — and issues
hand-built SQL per batch. The Spark-native form is declarative:
``spark.read.format("jdbc")`` with *partitioned reads* so a 100 TB
table scan fans out across executors, plus pushed-down predicates
and pruned columns (Catalyst handles both for JDBC —
``pushDownPredicate`` defaults true).

Executed coverage: the default test suite runs this module against
embedded Derby (``tests/test_jdbc_derby.py`` — Spark's classpath
carries the driver): append, partitioned reads, and the staged
ANSI-MERGE upsert all execute over real connections. The MySQL
``ON DUPLICATE KEY`` dialect is covered by the flag-gated live
round-trip (``tests/test_jdbc_live.py``). Every reader built here
is a plain DataFrame, so the whole operator library composes with
it unchanged.

Key scale choices (vs the reference):

- ``partitionColumn/lowerBound/upperBound/numPartitions`` split the
  scan into range predicates executed concurrently — replacing the
  reference's single-connection LIMIT/OFFSET pagination
  (``models/EtlLogger.js:13``), which both over-reads and serializes.
- ``fetchsize`` (row batching per round-trip) replaces the 50 000-row
  application batches (``services/etlService.js:14``).
- writes use ``batchsize`` + ``truncate`` options; real upserts go
  through the keyed sinks (``sources.sinks``) or the warehouse's
  MERGE — plain JDBC writes are not transactional across partitions
  (SURVEY §4 'transactional atomicity').
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


@dataclass(frozen=True)
class JdbcEndpoint:
    """one side of the sync (the reference's pool config,
    ``config/db.js`` — credentials come from the environment there
    and should here too; never inline them)."""

    url: str  # e.g. jdbc:mysql://host:3306/db
    user: str
    password: str
    driver: str = "com.mysql.cj.jdbc.Driver"
    options: dict[str, str] = field(default_factory=dict)


def reader_options(
    endpoint: JdbcEndpoint,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """assemble the option map for a (possibly partitioned) JDBC
    read. ``dbtable`` may be a table name or a pushdown subquery
    ``(SELECT ...) t``."""
    opts: dict[str, str] = {
        "url": endpoint.url,
        "dbtable": table,
        "user": endpoint.user,
        "password": endpoint.password,
        "driver": endpoint.driver,
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true",
        **endpoint.options,
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower/upper bounds")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_table(
    spark: SparkSession,
    endpoint: JdbcEndpoint,
    table: str,
    **kwargs,
) -> DataFrame:
    """partitioned JDBC scan as a DataFrame (S1 at scale)."""
    reader: DataFrameReader = spark.read.format("jdbc")
    for k, v in reader_options(endpoint, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()


#: identifiers the reference escapes when building INSERT column lists
#: (``bulkInsertRecords``, ``services/etlService.js:134-137``)
RESERVED_KEYWORDS = frozenset({"long", "group", "order", "desc", "primary"})


def _escape(col: str, quote: str = "`") -> str:
    """quote a reserved identifier with the dialect's quote char:
    backticks for MySQL, double quotes for ANSI (MERGE warehouses) —
    a backtick-quoted column inside a MERGE statement is a syntax
    error on standard-SQL targets."""
    return f"{quote}{col}{quote}" if col.lower() in RESERVED_KEYWORDS else col


def writer_options(
    endpoint: JdbcEndpoint,
    table: str,
    batchsize: int = 10_000,
    truncate: bool = False,
    isolation_level: str = "READ_COMMITTED",
) -> dict[str, str]:
    """assemble the option map for a JDBC write.

    - ``batchsize``: rows per ``executeBatch`` round-trip — the
      JDBC-native form of the reference's 50 000-row application
      batches (``etlService.js:14``).
    - ``truncate``: with overwrite mode, TRUNCATE instead of
      DROP+CREATE so grants/indexes/partitioning survive.
    """
    return {
        "url": endpoint.url,
        "dbtable": table,
        "user": endpoint.user,
        "password": endpoint.password,
        "driver": endpoint.driver,
        "batchsize": str(batchsize),
        "truncate": str(truncate).lower(),
        "isolationLevel": isolation_level,
        **endpoint.options,
    }


def upsert_statement(
    table: str,
    columns: list[str],
    key_col: str = "rsbsa_no",
    staging: str | None = None,
    dialect: str = "mysql",
) -> str:
    """the set-based upsert executed on the target after the staging
    load — the merge half of ``write_jdbc(mode='upsert')``.

    Mirrors ``bulkUpdateRecords`` (``etlService.js:117-130``): every
    non-key column lands in the update list, the key drives conflict
    detection. The reference interpolates VALUES row-by-row from the
    driver; here the payload is already in ``staging`` (loaded in
    parallel by executors), so the statement is one INSERT..SELECT —
    set-based, size-independent, and runs inside the DBMS.
    ``dialect='merge'`` emits the ANSI MERGE equivalent for
    warehouses without MySQL's ON DUPLICATE KEY.
    """
    staging = staging or f"{table}__stage"
    non_key = [c for c in columns if c != key_col]
    if dialect == "mysql":
        cols = [_escape(c) for c in columns]
        sets = ", ".join(f"{_escape(c)} = VALUES({_escape(c)})" for c in non_key)
        return (
            f"INSERT INTO {table} ({', '.join(cols)}) "
            f"SELECT {', '.join(cols)} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    if dialect == "merge":
        # ANSI identifier quoting: double quotes, not backticks
        q = '"'
        cols = [_escape(c, q) for c in columns]
        sets = ", ".join(
            f"t.{_escape(c, q)} = s.{_escape(c, q)}" for c in non_key
        )
        ins_cols = ", ".join(cols)
        ins_vals = ", ".join(f"s.{c}" for c in cols)
        return (
            f"MERGE INTO {table} t USING {staging} s "
            f"ON t.{_escape(key_col, q)} = s.{_escape(key_col, q)} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )
    raise ValueError(f"unknown upsert dialect: {dialect}")


def write_jdbc(
    df: DataFrame,
    endpoint: JdbcEndpoint,
    table: str,
    mode: str = "append",
    key_col: str = "rsbsa_no",
    batchsize: int = 10_000,
    truncate: bool = False,
    dialect: str = "mysql",
) -> str | None:
    """K1/K2 JDBC sink (``etlService.js:117-146``).

    - ``mode='append'``: bulk insert (``bulkInsertRecords``).
    - ``mode='overwrite'``: full reload; ``truncate=True`` keeps the
      table definition.
    - ``mode='upsert'``: the scale-correct form of
      ``bulkUpdateRecords`` — executors bulk-load a staging table in
      parallel (overwrite), then ONE set-based
      INSERT..ON DUPLICATE KEY UPDATE (or MERGE) runs on the target.
      Returns that statement for the caller to execute on its target
      connection; plain multi-partition JDBC writes cannot be a
      transactional upsert on their own (SURVEY §4).

    Returns the merge statement for upsert mode, else None.
    """
    if mode == "upsert":
        staging = f"{table}__stage"
        writer = df.write.format("jdbc").mode("overwrite")
        for k, v in writer_options(
            endpoint, staging, batchsize=batchsize, truncate=True
        ).items():
            writer = writer.option(k, v)
        writer.save()
        return upsert_statement(
            table, df.columns, key_col=key_col, staging=staging, dialect=dialect
        )
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown write mode: {mode}")
    writer = df.write.format("jdbc").mode(mode)
    for k, v in writer_options(
        endpoint, table, batchsize=batchsize, truncate=truncate
    ).items():
        writer = writer.option(k, v)
    writer.save()
    return None


def write_table(
    df: DataFrame,
    endpoint: JdbcEndpoint,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
) -> None:
    """K1 bulk load over JDBC (``bulkInsertRecords``,
    ``services/etlService.js:132-146``). For K2/K3 semantics against
    a warehouse, use ``write_jdbc(mode='upsert')`` or land to
    staging and MERGE there."""
    write_jdbc(df, endpoint, table, mode=mode, batchsize=batchsize)
