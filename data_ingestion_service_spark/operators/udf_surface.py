"""UDF surface demo (SURVEY.md §2.11).

UDFs are deliberately kept OFF the hot path everywhere else in this engine
(built-in expressions stay inside whole-stage codegen). This module proves
the Arrow-vectorized escape hatch works: a scalar ``pandas_udf`` computing
a checkable expression, so the DuckDB oracle can still verify the result.
Rounding happens JVM-side *after* the UDF (numpy's round is banker's
rounding; Spark/DuckDB round half-away — never round inside the UDF).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from data_ingestion_service_spark.catalog import load_table
from data_ingestion_service_spark.registry import register


def _make_discounted_udf():
    # Built lazily: pandas_udf registration needs an active SparkContext,
    # which doesn't exist at import time in the driver's verify flow.
    @pandas_udf(DoubleType())
    def _discounted_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    return _discounted_price


# Parity note: price*(1-discount) is a true-4-decimal quantity; rounding it
# to 2dp lands exactly on .xx5 boundaries where Spark and DuckDB round
# doubles differently. Requantize at the data's own precision instead
# (x*1e4 is integer-valued, so round-to-int has no boundary ambiguity) and
# return the full-precision value — bit-identical in both engines.
_PANDAS_UDF_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT) / 10000.0 AS discounted
FROM lineitem
WHERE l_orderkey <= 100
"""


@register("q_pandas_udf", oracle=_PANDAS_UDF_ORACLE)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    discounted = _make_discounted_udf()
    return li.filter(F.col("l_orderkey") <= 100).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.round(discounted(F.col("l_extendedprice"), F.col("l_discount")) * 10000, 0)
            .cast("bigint")
            / 10000.0
        ).alias("discounted"),
    )
