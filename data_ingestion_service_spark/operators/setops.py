"""Set operations: UNION ALL / INTERSECT / EXCEPT (SURVEY.md §2.7).

INTERSECT/EXCEPT use SQL distinct-set semantics in both engines (Spark
``intersect``/``exceptAll`` map 1:1 onto the SQL operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_service_spark.catalog import load_table
from data_ingestion_service_spark.registry import register

_UNION_ORACLE = """
SELECT c_custkey AS entity_key, 'customer' AS entity_kind, round(c_acctbal, 2) AS balance
FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT s_suppkey AS entity_key, 'supplier' AS entity_kind, round(s_acctbal, 2) AS balance
FROM supplier
"""


@register("q_union_all", oracle=_UNION_ORACLE)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("entity_key"),
        F.lit("customer").alias("entity_kind"),
        F.round(F.col("c_acctbal"), 2).alias("balance"),
    )
    s = supp.select(
        F.col("s_suppkey").alias("entity_key"),
        F.lit("supplier").alias("entity_kind"),
        F.round(F.col("s_acctbal"), 2).alias("balance"),
    )
    return c.unionByName(s)


_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal > 0
"""


@register("q_intersect", oracle=_INTERSECT_ORACLE)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.select(F.col("o_custkey").alias("custkey")).intersect(
        cust.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    )


_EXCEPT_ORACLE = """
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
"""


@register("q_except", oracle=_EXCEPT_ORACLE)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(F.col("c_custkey").alias("custkey")).exceptAll(
        orders.select(F.col("o_custkey").alias("custkey")).distinct()
    )
