"""Sources: typed readers for the fixture tables, log files, JDBC."""

from rsbsa_etl_spark.sources.fixtures import FIXTURE_TABLES, load, load_all

__all__ = ["FIXTURE_TABLES", "load", "load_all"]
