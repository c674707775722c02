"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the engine's named-query registry
(loan_approval_prediction_data_engineering_ml_pipeline_spark/plans) — one
entry per implemented operator from SURVEY.md §2, each Spark callable
paired with the ANSI-SQL twin the DuckDB oracle runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    customer ⋈ nation ⋈ region → group by r_name → count, avg(acctbal):
    the Spark transposition of the reference's 3-way loan-star merge +
    value_counts (LP.ipynb:376-379, 667-669).
    """
    return registry.QUERIES["star_join_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.oracle_queries()
