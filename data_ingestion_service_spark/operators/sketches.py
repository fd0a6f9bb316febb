"""Sketch aggregates: mergeable summaries for distinct-count and
heavy-hitter queries (SURVEY.md §2.4 extensions).

These are the distinct-count structures that actually scale: a sketch is
built map-side per partition, shuffled as a few KB, and merged — no
shuffle of raw keys. Three surfaces:

- ``q_hll_distinct``: Apache DataSketches HLL (``hll_sketch_agg`` /
  ``hll_union_agg`` / ``hll_sketch_estimate``) — the re-aggregatable
  distinct sketch (store per-partition sketches, union across any slice
  later). Estimates are EXACT below the sketch's sparse-mode threshold,
  so the fixture dimensions (≤5 distinct) hash-match the exact oracle at
  every scale factor.
- ``q_bitmap_distinct``: bitmap distinct counting (``bitmap_bit_position``
  / ``bitmap_construct_agg`` / ``bitmap_count``) — EXACT at any
  cardinality: integer keys become set bits in per-bucket bitmaps, the
  bitmaps OR-merge, the total popcount is the distinct count. The
  pre-aggregation pattern behind every "count distinct users per X"
  dashboard at 100 TB.
- ``q_approx_top_k``: frequency-sketch heavy hitters (``approx_top_k``)
  — counts are exact while observed distincts fit the tracked-item
  budget (10k), which holds for the 5-value dimension at every sf; k
  covers the full domain so no tie-dependent truncation exists for the
  oracle to disagree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_service_spark.catalog import load_table
from data_ingestion_service_spark.registry import register

# ---------------------------------------------------------------------------
# q_hll_distinct — per-year HLL sketches + an all-years union row (the
# "store sketches, merge any slice" pattern).
# ---------------------------------------------------------------------------

_HLL_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       count(DISTINCT o_orderpriority)     AS n_priorities
FROM orders
GROUP BY 1
UNION ALL
SELECT -1 AS yr, count(DISTINCT o_orderpriority) AS n_priorities
FROM orders
"""


@register("q_hll_distinct", oracle=_HLL_ORACLE)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr")
    ).agg(F.hll_sketch_agg("o_orderpriority").alias("sk"))
    per_year = yearly.select(
        "yr", F.hll_sketch_estimate("sk").alias("n_priorities")
    )
    unioned = yearly.agg(
        F.lit(-1).alias("yr"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_priorities"),
    )
    return per_year.unionAll(unioned)


# ---------------------------------------------------------------------------
# q_bitmap_distinct — exact distinct users per event type via per-bucket
# bitmaps (two-level aggregation: construct per (type, bucket), popcount
# and sum per type).
# ---------------------------------------------------------------------------

_BITMAP_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


@register("q_bitmap_distinct", oracle=_BITMAP_ORACLE)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )


# ---------------------------------------------------------------------------
# q_approx_top_k — heavy hitters over the event-type stream; k spans the
# whole domain so the result is the full exact frequency table.
# ---------------------------------------------------------------------------

_TOPK_SKETCH_ORACLE = """
SELECT event_type AS item, count(*) AS cnt
FROM events
GROUP BY event_type
"""


@register("q_approx_top_k", oracle=_TOPK_SKETCH_ORACLE)
def q_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = ev.agg(F.expr("approx_top_k(event_type, 5)").alias("tk"))
    return arr.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("cnt")
    )
