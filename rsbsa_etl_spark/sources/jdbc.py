"""JDBC source/sink wiring (SURVEY §2.1 S1 source side; §1.1 pools).

The reference holds two mysql2 pools — source and target
(``config/db.js:5-19,21-35``, 10 connections each) — and issues
hand-built SQL per batch. The Spark-native form is declarative:
``spark.read.format("jdbc")`` with *partitioned reads* so a 100 TB
table scan fans out across executors, plus pushed-down predicates
and pruned columns (Catalyst handles both for JDBC —
``pushDownPredicate`` defaults true).

No JDBC driver ships in this container, so this module is exercised
at the option-construction level (unit tests) and documented as the
production path; every reader built here is a plain DataFrame, so
the whole operator library composes with it unchanged.

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


def write_table(
    df: DataFrame,
    endpoint: JdbcEndpoint,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
) -> None:
    """K1 bulk load over JDBC (``bulkInsertRecords``,
    ``services/etlService.js:132-146``). For K2/K3 semantics against
    a warehouse, land to staging and MERGE there."""
    (
        df.write.format("jdbc")
        .option("url", endpoint.url)
        .option("dbtable", table)
        .option("user", endpoint.user)
        .option("password", endpoint.password)
        .option("driver", endpoint.driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )
