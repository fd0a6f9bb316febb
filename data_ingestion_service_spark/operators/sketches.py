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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# q_kmv_overlap — K-Minimum-Values sketch overlap between source
# SHINGLE sets (3-gram shingles: the fixture's word vocabulary is ~31
# tokens, far below any useful k, while the shingle domain is ~16k —
# the estimator actually estimates), WITH the exact truth beside it
# (the q_lsh_recall pattern: ship the approximation as an audited
# metric, not a leap of faith). For every source pair: the KMV
# union-cardinality estimate (k=64), the Jaccard estimate from the
# shared fraction of the merged sketch, and the exact distinct-shingle
# union/intersection for error reading.
#
# Why KMV: a per-source sketch is 64 BIGINTs, mergeable by "union, keep
# k smallest" — cross-slice overlap questions at 100 TB touch kilobytes
# after the one distinct reduce, and new slices union out of stored
# per-partition sketches without rescanning. The hash is the repo's
# standard 15-hex md5 bigint (pure function of the shingle — no RNG,
# identical literal construction in both engines).
#
# Estimator (Beyer et al. 2007): with h ~ uniform on [0, M), the k-th
# smallest of n distinct hashes ≈ M·k/n, so n̂ = (k−1)·M/kth; when the
# merged sketch holds FEWER than k values the sketch IS the whole set
# and the count is exact (the regime the 31-token vocabulary would
# have hit — guarded explicitly on both engines). Ĵ = shared fraction
# of the merged sketch (denominator = its actual size, ≤ k).
#
# Scale: one distinct-(source, shingle) reduce (map-side combinable;
# the only corpus-sized pass, shared by sketch and truth sides), a
# top-k window per source, then ALL pair logic runs on the
# ≤(sources × 64)-row sketch table. The exact-truth self-join is
# bounded by the distinct-shingle table, not the corpus, and exists to
# audit the estimate — at 100 TB you would keep only the sketches.
# ---------------------------------------------------------------------------

_KMV_K = 64
# Ceiling of the 15-hex-digit hash domain (2^60), exactly representable
# as a double.
_KMV_M = float(1 << 60)

_KMV_VOCAB_SQL = """
  SELECT DISTINCT source, s
  FROM (SELECT source,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 3)
"""

_KMV_ORACLE = f"""
WITH vocab AS MATERIALIZED ({_KMV_VOCAB_SQL}),
st AS (
  SELECT source, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM vocab
),
sk AS MATERIALIZED (
  SELECT source, h
  FROM (SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        FROM st)
  WHERE rk <= {_KMV_K}
),
merged AS (
  SELECT src_a, src_b, h,
         CAST(count(*) AS BIGINT) AS n_sides,
         row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
  FROM (
    SELECT a.source AS src_a, b.source AS src_b, a.h
    FROM sk a JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
    UNION ALL
    SELECT a.source AS src_a, b.source AS src_b, b.h
    FROM (SELECT DISTINCT source FROM sk) a JOIN sk b ON a.source < b.source
  ) u
  GROUP BY 1, 2, 3
),
kstat AS (
  SELECT src_a, src_b,
         max(h)                   AS kth,
         CAST(count(*) AS BIGINT) AS n_k,
         CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS shared_mins
  FROM merged
  WHERE rk <= {_KMV_K}
  GROUP BY 1, 2
),
vsize AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM vocab GROUP BY 1),
inter AS (
  SELECT t1.source AS src_a, t2.source AS src_b,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM vocab t1 JOIN vocab t2
    ON t1.s = t2.s AND t1.source < t2.source
  GROUP BY 1, 2
)
SELECT k.src_a, k.src_b,
       CASE WHEN k.n_k < {_KMV_K} THEN k.n_k
            ELSE CAST(floor(({_KMV_K} - 1) * {_KMV_M!r}
                            / CAST(k.kth AS DOUBLE)) AS BIGINT)
       END                                            AS est_union,
       k.shared_mins,
       CAST(floor(CAST(k.shared_mins AS DOUBLE) * 1000000
                  / CAST(k.n_k AS DOUBLE)) AS BIGINT) AS est_jaccard_e6,
       va.v + vb.v - i.exact_inter                    AS exact_union,
       i.exact_inter,
       CAST(floor(CAST(i.exact_inter AS DOUBLE) * 1000000
                  / CAST(va.v + vb.v - i.exact_inter AS DOUBLE))
            AS BIGINT)                                AS exact_jaccard_e6
FROM kstat k
JOIN inter i ON i.src_a = k.src_a AND i.src_b = k.src_b
JOIN vsize va ON va.source = k.src_a
JOIN vsize vb ON vb.source = k.src_b
"""


@register("q_kmv_overlap", oracle=_KMV_ORACLE)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.functions.text import tokens
    from data_ingestion_service_spark.session import session_persisted

    def _build_vocab() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        toked = docs.select("source", tokens("text").alias("t")).filter(
            F.size("t") >= 3
        )
        # codegen-friendly positional shingling (shingle_rows' pattern,
        # keyed by source instead of doc_id)
        return (
            toked.select(
                "source",
                F.explode(F.sequence(F.lit(0), F.size("t") - 3)).alias("i"),
                "t",
            )
            .select(
                "source",
                F.concat_ws(
                    " ", F.col("t")[F.col("i")], F.col("t")[F.col("i") + 1],
                    F.col("t")[F.col("i") + 2]
                ).alias("s"),
            )
            .distinct()
        )

    # The distinct (source, shingle) reduce is the ONLY corpus-sized
    # pass and has THREE consumers below (sketch, vsize, exact-truth
    # join) — without persistence the shingling lineage ran 3x per
    # invocation (measured r8: ~0.9s of the 2-3s warm wall per extra
    # pass). Session store, per the repo's no-per-call-persist rule.
    vocab = session_persisted(spark, ("kmv_vocab", sf_dir), _build_vocab)
    st = vocab.select(
        "source",
        F.conv(F.substring(F.md5(F.col("s").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    rk = Window.partitionBy("source").orderBy("h")
    sk = (
        st.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _KMV_K)
        .select("source", "h")
    )
    # r12 (guide §3.3 / §5): sk has FOUR consumers below (side_a,
    # broadcast side_b, and srcs twice) and each broadcast job re-ran the
    # md5 + rank-window subtree over the corpus-sized vocab — the hash
    # pass executed 4x per call. The sketch is ≤ |sources|·k rows by
    # definition: one bounded localCheckpoint materialization per call,
    # every consumer reads the LogicalRDD (same-session A/B: 1.88 →
    # 1.42s). The two-phase bucket-bracket top-K (1024-bucket counts →
    # per-source cutoff → windowed survivors) was built and MEASURED
    # WORSE on both shapes (2.43s ckpt / 2.92s plain): its two extra
    # aggregation passes + cutoff broadcast cost more than the one
    # in-group sort they remove — the window's input is the cached
    # domain-sized vocab, not the corpus. Reverted; at 100 TB the
    # bracket math flips only if per-source vocab stops fitting a sort
    # task, which the hot-shingle cap upstream already bounds.
    sk = sk.localCheckpoint()
    srcs = sk.select("source").distinct()
    side_a = sk.alias("a").join(
        F.broadcast(srcs.alias("b")), F.col("a.source") < F.col("b.source")
    ).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.h").alias("h"),
    )
    side_b = srcs.alias("a").join(
        F.broadcast(sk.alias("b")), F.col("a.source") < F.col("b.source")
    ).select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("b.h").alias("h"),
    )
    merged = (
        side_a.unionAll(side_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sides"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("src_a", "src_b").orderBy("h")
            ),
        )
        .filter(F.col("rk") <= _KMV_K)
    )
    kstat = merged.groupBy("src_a", "src_b").agg(
        F.max("h").alias("kth"),
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum(F.when(F.col("n_sides") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("shared_mins"),
    )
    # |sources| rows with two broadcast consumers (va, vb) — each
    # broadcast job re-ran the vocab count; checkpoint once (r12).
    vsize = vocab.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    ).localCheckpoint()
    # r11 optimization (guide §2.4): the exact intersection used to
    # self-join the persisted vocab on shingle equality — two full
    # shuffles of the corpus-sized (source, shingle) table plus the join.
    # One groupBy(s) with a |sources|-bounded collect_set emits the same
    # (src_a < src_b) co-occurrence pairs map-side (posting-list pattern,
    # fanout ≤ |sources|² per shingle — a domain constant), so the
    # intersection needs exactly ONE corpus exchange.
    posting = (
        vocab.groupBy("s")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    expanded = posting.select(
        "ss", F.explode(F.sequence(F.lit(0), F.size("ss") - 2)).alias("i")
    )
    inter = (
        expanded.select(
            "ss",
            "i",
            F.explode(F.sequence(F.col("i") + 1, F.size("ss") - 1)).alias("j"),
        )
        .groupBy(
            F.col("ss")[F.col("i")].alias("src_a"),
            F.col("ss")[F.col("j")].alias("src_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    va = vsize.select(F.col("source").alias("src_a"), F.col("v").alias("va"))
    vb = vsize.select(F.col("source").alias("src_b"), F.col("v").alias("vb"))
    out = (
        kstat.join(inter, ["src_a", "src_b"])
        .join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
    )
    return out.select(
        "src_a",
        "src_b",
        F.when(F.col("n_k") < _KMV_K, F.col("n_k"))
        .otherwise(
            F.floor(
                (_KMV_K - 1) * F.lit(_KMV_M) / F.col("kth").cast("double")
            ).cast("bigint")
        )
        .alias("est_union"),
        "shared_mins",
        F.floor(
            F.col("shared_mins").cast("double")
            * 1000000
            / F.col("n_k").cast("double")
        )
        .cast("bigint")
        .alias("est_jaccard_e6"),
        (F.col("va") + F.col("vb") - F.col("exact_inter")).alias(
            "exact_union"
        ),
        "exact_inter",
        F.floor(
            F.col("exact_inter").cast("double")
            * 1000000
            / (F.col("va") + F.col("vb") - F.col("exact_inter")).cast(
                "double"
            )
        )
        .cast("bigint")
        .alias("exact_jaccard_e6"),
    )
