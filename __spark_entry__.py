"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``rsbsa_etl_spark``; this module only wires
the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the TPC-H-Q1-shaped pricing summary
    (``agg_sum_groups``) on sf0.001."""
    from rsbsa_etl_spark.registry import QUERIES

    return QUERIES["agg_sum_groups"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    extension surface (dedup / similarity / text / multimodal /
    windows / streaming)."""
    from rsbsa_etl_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key — every registered query is
    value-checked, including the streaming keys (their engine output
    is deterministic over the fixtures, so batch SQL is a valid
    oracle) and the multimodal decode path."""
    from rsbsa_etl_spark.oracles import ORACLES

    return dict(ORACLES)
