"""Shared fixtures: one tuned SparkSession + a DuckDB connection with the
fixture tables registered as views (mirrors the driver's oracle setup).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from data_ingestion_service_spark.catalog import TABLES
from data_ingestion_service_spark.session import get_spark

# Small SF by default for speed; SPARK_GRAFT_TEST_SF_DIR overrides (run the
# full suite at sf0.01 before declaring keys to the driver — SURVEY.md §5).
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ingestion-engine-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{TEST_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR
