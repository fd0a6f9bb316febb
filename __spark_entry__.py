"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``data_ingestion_service_spark`` (see registry.py):
``entry(spark)`` runs the flagship TPC-H Q1 aggregate at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB-checkable ANSI-SQL twin (keys without an
oracle entry are the declared rows-only ◐ operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_service_spark.registry import ORACLES, QUERIES, load_all_operators

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    load_all_operators()
    return QUERIES["q1_pricing_summary"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all_operators()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (omitted → rows-only check)."""
    load_all_operators()
    return dict(ORACLES)
