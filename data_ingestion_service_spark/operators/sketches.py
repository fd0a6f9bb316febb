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


# ---------------------------------------------------------------------------
# q_countmin_audit — a hand-built Count-Min sketch over the corpus term
# stream with its error MEASURED against the exact counts (the
# q_lsh_recall / q_ann_recall / q_bloom_prefilter discipline applied to
# the frequency-sketch family): 4 md5 hash rows × 256 counters, point
# estimates for the exact top-10 terms, and the per-term overestimate
# (CM never underestimates — collisions only ADD) reported as data.
# This is how a 100 TB pipeline sizes a heavy-hitter sketch: build at a
# candidate width, audit the overestimate, widen if it matters.
#
# Exactness: every counter is an exact BIGINT sum over md5-assigned
# cells; estimates are min() over 4 exact counters; identical literal
# hash construction in both engines.
#
# Scale: one token-count shuffle (vocabulary-bounded), a 4× map-side
# fan-out of the COUNTED vocabulary (not the token stream) into 1024
# cells, and a 10-row probe join against the broadcast sketch. The raw
# corpus is scanned once.
# ---------------------------------------------------------------------------

_CM_ROWS = 4
_CM_WIDTH = 256

_CM_CELL_SQL = (
    "('0x' || substr(md5(CAST({r} AS VARCHAR) || '#' || term), 1, 8))::BIGINT"
    f" % {_CM_WIDTH}"
)

_COUNTMIN_ORACLE = f"""
WITH tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> ''
  GROUP BY term
),
cells AS (
  SELECT r.r, {_CM_CELL_SQL.format(r="r.r")} AS col,
         CAST(sum(c) AS BIGINT) AS counter
  FROM tf CROSS JOIN (SELECT unnest(range(0, {_CM_ROWS})) AS r) r
  GROUP BY 1, 2
),
top_terms AS (
  SELECT term, c FROM tf ORDER BY c DESC, term LIMIT 10
)
SELECT t.term, t.c AS exact_count,
       min(cl.counter) AS cm_estimate,
       min(cl.counter) - t.c AS overestimate
FROM top_terms t
CROSS JOIN (SELECT unnest(range(0, {_CM_ROWS})) AS r) r
JOIN cells cl ON cl.r = r.r AND cl.col = {_CM_CELL_SQL.format(r="r.r")}
GROUP BY t.term, t.c
"""


@register("q_countmin_audit", oracle=_COUNTMIN_ORACLE)
def q_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )

    def cell(r_col: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "#", F.col(r_col).cast("string"), F.col("term")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _CM_WIDTH
        )

    fanned = tf.select(
        "term",
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_CM_ROWS - 1))).alias("r"),
    )
    cells = (
        fanned.select("r", cell("r").alias("col"), "c")
        .groupBy("r", "col")
        .agg(F.sum("c").cast("bigint").alias("counter"))
    )
    top_terms = tf.orderBy(F.desc("c"), F.asc("term")).limit(10)
    probes = top_terms.select(
        "term",
        F.col("c").alias("exact_count"),
        F.explode(F.sequence(F.lit(0), F.lit(_CM_ROWS - 1))).alias("r"),
    ).select("term", "exact_count", "r", cell("r").alias("col"))
    return (
        probes.join(F.broadcast(cells), ["r", "col"])
        .groupBy("term", "exact_count")
        .agg(F.min("counter").alias("cm_estimate"))
        .select(
            "term",
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_count")).alias(
                "overestimate"
            ),
        )
    )
