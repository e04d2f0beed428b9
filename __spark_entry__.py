"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k over sf0.001;
``queries()``/``oracle_sql()`` expose every SQL-checkable operator from
SURVEY.md §2 plus the training-data-pipeline extras (dedup, similarity,
text quality, event analytics). Implementations live in
``search_engine_spark``; this file only wires them to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark.plans.driver_queries import (
    driver_oracle_sql,
    driver_queries,
    q_bm25_topk,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: weighted BM25 top-k over the sf0.001 documents."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries()


def oracle_sql() -> dict[str, str]:
    return driver_oracle_sql()
