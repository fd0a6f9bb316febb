"""Reporting-layer operators: activity matrices, decile shares,
histograms, and the null-handling join/union shapes BI layers depend on.

All exact-arithmetic: shares and deciles are computed over integer cents
so both engines rank and divide identical values (SURVEY.md §5 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_service_spark.catalog import load_table
from data_ingestion_service_spark.registry import register

# ---------------------------------------------------------------------------
# q_hourly_matrix — hour-of-day × event-type activity matrix.
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = """
SELECT
  hour(ts)::BIGINT AS hr,
  count(CASE WHEN event_type = 'click'    THEN 1 END) AS clicks,
  count(CASE WHEN event_type = 'view'     THEN 1 END) AS views,
  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
  count(CASE WHEN event_type = 'signup'   THEN 1 END) AS signups,
  count(CASE WHEN event_type = 'error'    THEN 1 END) AS errors,
  count(*) AS total
FROM events
GROUP BY 1
"""


@register("q_hourly_matrix", oracle=_HOURLY_ORACLE)
def q_hourly_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1))

    return ev.groupBy(F.hour("ts").cast("bigint").alias("hr")).agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("signup").alias("signups"),
        cnt("error").alias("errors"),
        F.count(F.lit(1)).alias("total"),
    )


# ---------------------------------------------------------------------------
# q_decile_share — customer revenue deciles and each decile's share of
# total revenue (exact integer cents end-to-end; the final share division
# happens on identical integers in both engines).
# ---------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, cents,
         ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
  FROM spend
),
tot AS (SELECT sum(cents) AS total_cents FROM spend)
SELECT
  decile,
  count(*) AS n_customers,
  CAST(sum(cents) AS BIGINT) AS decile_cents,
  round(CAST(sum(cents) AS BIGINT) * 1.0 / CAST(total_cents AS BIGINT), 6) AS revenue_share
FROM ranked CROSS JOIN tot
GROUP BY decile, total_cents
"""


@register("q_decile_share", oracle=_DECILE_ORACLE)
def q_decile_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("cents")
    )
    ranked = spend.withColumn(
        "decile", F.ntile(10).over(Window.orderBy(F.desc("cents"), F.asc("o_custkey")))
    )
    tot = spend.agg(F.sum("cents").alias("total_cents"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("decile", "total_cents")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("decile_cents"),
        )
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            F.round(F.col("decile_cents") * 1.0 / F.col("total_cents"), 6).alias(
                "revenue_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_null_safe_join — null-safe equality (<=> / IS NOT DISTINCT FROM):
# synthesized NULL keys on both sides must match each other.
# ---------------------------------------------------------------------------

_NULL_SAFE_ORACLE = """
SELECT
  coalesce(CAST(c.k AS VARCHAR), 'NULL') AS join_key,
  count(*) AS n_pairs
FROM (
  SELECT nullif(c_nationkey, 3) AS k FROM customer
) c
JOIN (
  SELECT nullif(n_nationkey, 3) AS k FROM nation
) n ON c.k IS NOT DISTINCT FROM n.k
GROUP BY 1
"""


@register("q_null_safe_join", oracle=_NULL_SAFE_ORACLE)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("ck")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey"), F.lit(3)).alias("nk")
    )
    return (
        cust.join(F.broadcast(nation), F.col("ck").eqNullSafe(F.col("nk")))
        .groupBy(F.coalesce(F.col("ck").cast("string"), F.lit("NULL")).alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# q_union_missing_cols — unionByName with schema alignment (missing
# columns NULL-filled): the heterogeneous-feed merge shape.
# ---------------------------------------------------------------------------

_UNION_MISSING_ORACLE = """
SELECT c_custkey AS entity_key, round(c_acctbal, 2) AS balance, NULL AS entity_name
FROM customer WHERE c_custkey <= 100
UNION ALL
SELECT s_suppkey AS entity_key, NULL AS balance, s_name AS entity_name
FROM supplier
"""


@register("q_union_missing_cols", oracle=_UNION_MISSING_ORACLE)
def q_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.select(
        F.col("c_custkey").alias("entity_key"),
        F.round(F.col("c_acctbal"), 2).alias("balance"),
    )
    s = supp.select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
    )
    return c.unionByName(s, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# q_histogram — fixed-width value histogram of event values.
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
SELECT
  CAST(floor(value / 50.0) AS BIGINT) AS bucket,
  count(*)                            AS n,
  round(min(value), 2)                AS lo,
  round(max(value), 2)                AS hi
FROM events
GROUP BY 1
"""


@register("q_histogram", oracle=_HISTOGRAM_ORACLE)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )
