"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — every verified operator from SURVEY §2 + pipeline ops.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
non-SQL-expressible operators, which fall back to rows-only checks).

The real registry lives in ``duckdb_mpp_spark.queries``; this module is a
thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from duckdb_mpp_spark.queries import run_spark_query

    return run_spark_query("q01_pricing_summary", spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from duckdb_mpp_spark.queries import spark_callables

    return spark_callables()


def oracle_sql() -> dict[str, str]:
    from duckdb_mpp_spark.queries import oracle_sqls

    return oracle_sqls()
