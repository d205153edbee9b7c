"""rsbsa_etl_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
ETL service (djacob0/RSBSA-etl, see SURVEY.md) as idiomatic PySpark:
declarative DataFrame plans optimized by Catalyst, plus an extension
surface of LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

Public surface:
    - ``rsbsa_etl_spark.session``   — SparkSession factory with scale-aware conf
    - ``rsbsa_etl_spark.sources``   — typed readers for fixtures / logs / JDBC
    - ``rsbsa_etl_spark.operators`` — relational operator library (SURVEY §2)
    - ``rsbsa_etl_spark.functions`` — scalar/text/dedup/similarity functions
    - ``rsbsa_etl_spark.plans``     — composed pipelines (incremental sync)
    - ``rsbsa_etl_spark.streaming`` — Structured Streaming surface
    - ``rsbsa_etl_spark.registry``  — the (queries, oracle_sql) driver contract
"""

__version__ = "0.1.0"
