"""Non-parquet sources and sinks: CSV, JSON-lines, partitioned parquet
(SURVEY.md §2.1).

Each query round-trips fixture data through the format under test and
aggregates the re-read result; the oracle aggregates the original parquet
directly, so a hash match proves the round-trip is lossless. Columns are
chosen so text serialization is exact (Spark writes shortest-round-trip
doubles; values re-parse bit-identically).

Sinks write under a per-call temp directory — safe for concurrent runs,
nothing outside /tmp is touched.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_service_spark.catalog import load_table
from data_ingestion_service_spark.registry import register

_CSV_ORACLE = """
SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS total_qty,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
GROUP BY l_returnflag
"""


@register("src_csv_roundtrip", oracle=_CSV_ORACLE)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="ingest_csv_")
    li.write.mode("overwrite").option("header", "true").csv(out)
    back = (
        spark.read.schema("l_returnflag string, l_quantity double, l_extendedprice double")
        .option("header", "true")
        .csv(out)
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


_JSONL_ORACLE = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


@register("src_json_lines", oracle=_JSONL_ORACLE)
def src_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "user_id")
    out = tempfile.mkdtemp(prefix="ingest_jsonl_")
    ev.write.mode("overwrite").json(out)
    back = spark.read.schema("event_type string, value double, user_id bigint").json(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


_PARTITIONED_SINK_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register("sink_parquet_partitioned", oracle=_PARTITIONED_SINK_ORACLE)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink, then re-scan.

    The re-read aggregation groups on the partition column, so Catalyst
    satisfies the partition-key side from directory metadata (partition
    pruning / no data read for the key) — the layout a 100 TB ingest sink
    would use for downstream predicate pruning.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    out = tempfile.mkdtemp(prefix="ingest_part_")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )
