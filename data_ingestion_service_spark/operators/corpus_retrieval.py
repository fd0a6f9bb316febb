"""Corpus retrieval / tokenization / training-mix family (split out of
corpus_ops.py in round 7 — pure move, no behavior change): BM25, RRF
fusion, MMR diversification, contrastive triplets, document chunking,
BPE pair-mining and tokenizer application, regex tokens, feature hashing,
random projection, embedding quantization, corpus temperature and DSIR
mixture weights, stratified sampling, and the near-dup-graph mining ops
(PageRank, triangle count, Adamic-Adar).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_service_spark.catalog import load_table
from data_ingestion_service_spark.functions.text import shingle_rows, tokens
from data_ingestion_service_spark.functions.vector import as_double, cosine
from data_ingestion_service_spark.operators.llm import (
    _HOT_SHINGLE_CAP,
    _NEAR_DEDUP_ORACLE,
    doc_shingles,
    near_dup_pairs,
)
from data_ingestion_service_spark.operators.llm_extended import (
    _DUP_CLUSTERS_ORACLE,
    _EMBED_NEAR_DUP_ORACLE,
)
from data_ingestion_service_spark.registry import register
from data_ingestion_service_spark.session import call_persisted, session_persisted

# ---------------------------------------------------------------------------
# q_bm25 — BM25 keyword retrieval over the corpus (k1=1.2, b=0.75).
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "scan", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _sql_tf(term: str) -> str:
    return f"len(list_filter(t, w -> w = '{term}'))"


_BM25_ORACLE = f"""
WITH d AS (
  SELECT doc_id, len(t) AS dl,
         {", ".join(f"{_sql_tf(t)} AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
         {", ".join(f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in range(len(_BM25_TERMS)))}
  FROM d
)
SELECT doc_id,
       round({" + ".join(
           f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1)"
           f" * tf{i} * ({_BM25_K1} + 1)"
           f" / (tf{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl))"
           for i in range(len(_BM25_TERMS)))}, 4) AS bm25
FROM d, stats
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


@register("q_bm25", oracle=_BM25_ORACLE)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed keyword query. Term frequencies come from
    array HOFs in the scan itself (no explode, no per-term shuffle);
    corpus stats (N, avgdl, per-term df) are ONE single-row aggregate
    broadcast back over the scored scan; the final top-k is
    TakeOrderedAndProject. At 100 TB: two passes over the corpus, no
    wide shuffle at all — df/avgdl would come from the corpus-stats
    catalog a real pipeline maintains incrementally anyway."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")

    def term_eq(term):
        # Closure factory, NOT a default-arg lambda: PySpark would treat
        # a second lambda parameter as the HOF's index argument.
        return lambda w: w == F.lit(term)

    d = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, term_eq(term))).alias(f"tf{i}")
            for i, term in enumerate(_BM25_TERMS)
        ],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        idf = F.log(
            (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1
        )
        part = (
            idf
            * F.col(f"tf{i}")
            * (_BM25_K1 + 1)
            / (
                F.col(f"tf{i}")
                + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = part if score is None else score + part
    return (
        d.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )

# ---------------------------------------------------------------------------
# q_stratified_sample — deterministic per-stratum downsampling: even-
# numbered sources keep a ~50% hash band, odd-numbered a ~25% band.
# The sample is a pure function of doc_id (md5 hex prefix, the
# q_train_test_split idiom), so it is reproducible across runs,
# machines, and engines — what "sampling" must mean in a pipeline whose
# outputs are audited. No randomness, no state, embarrassingly parallel.
# ---------------------------------------------------------------------------

_STRATIFIED_ORACLE = """
WITH tagged AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tok,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN '8' ELSE '4' END
           AS band,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN h < band THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN h < band THEN n_tok ELSE 0 END) AS BIGINT)
         AS sampled_tokens
FROM tagged
GROUP BY source
"""


@register("q_stratified_sample", oracle=_STRATIFIED_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    band = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, "8"
    ).otherwise("4")
    h = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    keep = h < band
    return (
        docs.select(
            "source",
            F.size(tokens("text")).alias("n_tok"),
            keep.alias("keep"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("sampled_tokens"),
        )
    )

# ---------------------------------------------------------------------------
# q_triangle_count — triangles in the near-dup graph (cluster-density
# signal: triangle-rich components are tight duplicate blobs; chains
# have none). DEGREE-ordered wedge join (Schank/Wagner): every edge is
# oriented from its lower- to its higher-(degree, id) endpoint, each
# triangle is counted exactly once at its lowest-ordered vertex, and a
# hub's wedge fan-out collapses (its out-edges point only to yet-higher-
# degree vertices), bounding total wedge work at O(m^1.5) even when the
# hot-shingle degree cap is loosened at 100 TB — the r4-noted refinement
# over id-ordering, where a low-id hub kept all O(d²) wedge pairs.
# Posture pinned by test_triangle_wedges_are_degree_ordered.
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = (
    "WITH nd AS MATERIALIZED ("
    + _NEAR_DEDUP_ORACLE
    + """),
e AS (SELECT doc_a AS a, doc_b AS b FROM nd),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
stats AS (
  SELECT (SELECT count(*) FROM e) AS n_edges,
         (SELECT count(DISTINCT v)
          FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)) AS n_vertices
)
SELECT tri.n_triangles, stats.n_edges, stats.n_vertices
FROM tri CROSS JOIN stats
"""
)


def _vertex_degrees(e: DataFrame) -> DataFrame:
    """(v, deg) over the undirected edge list — shared by the edge
    orientation AND the graph-stat aggregates (n_vertices = |deg|,
    n_edges = sum(deg) div 2), so the stats reuse this one shuffle
    (ReuseExchange) instead of paying their own union-scan +
    countDistinct shuffle over the vertex multiset (r11 action-census
    cut on q_triangle_count)."""
    return (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _degree_directed_edges(e: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """Orient each undirected edge from lower to higher (degree, id).

    The node-iterator refinement that survives hubs at 100 TB: a vertex
    of degree d only keeps out-edges to HIGHER-(degree,id) neighbors, so
    a hub's out-degree collapses and the wedge count is O(m^1.5)
    (Schank/Wagner ordered triangle listing) instead of O(sum deg²) —
    id-ordering leaves a low-id hub as wedge center with all d² pairs.
    Columns: src, dst, plus dst's order key (dd, dst) for wedge-side
    lexicographic comparison without a global rank (a global rank would
    need a corpus-wide window — one task)."""
    if deg is None:
        deg = _vertex_degrees(e)
    ed = (
        e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
    )


@register("q_triangle_count", oracle=_TRIANGLE_ORACLE)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Action-census note (VERDICT r10 item 5): steady-state 19 jobs
    # (r11-measured; was 21 before n_edges/n_vertices moved onto the
    # degree aggregate below). One collect() action; the jobs are AQE
    # exchange materializations of the ordered-wedge pipeline — degree
    # groupBy, two orientation joins, the wedge self-join, the closing
    # semi-join — each a required shuffle of the O(m^1.5) algorithm.
    # Exchange reuse between the orientation's deg and the stats' deg
    # is column-pruning-sensitive, hence deg is computed once and
    # passed to both consumers explicitly.
    e = near_dup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    deg = _vertex_degrees(e)
    d = _degree_directed_edges(e, deg)
    # Wedges centered at each triangle's LOWEST-ordered vertex; the two
    # legs are kept in (deg,id) order so the closing edge — necessarily
    # directed low→high — is a single equi-semi-join probe.
    leg_lt = (F.col("d1.dd") < F.col("d2.dd")) | (
        (F.col("d1.dd") == F.col("d2.dd")) & (F.col("d1.dst") < F.col("d2.dst"))
    )
    wedges = (
        d.alias("d1")
        .join(d.alias("d2"), F.col("d1.src") == F.col("d2.src"))
        .filter(leg_lt)
        .select(F.col("d1.dst").alias("wa"), F.col("d2.dst").alias("wc"))
    )
    tri = wedges.join(
        d.alias("e3"),
        (F.col("wa") == F.col("e3.src")) & (F.col("wc") == F.col("e3.dst")),
        "left_semi",
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    # Graph stats from the SAME degree aggregate the orientation uses
    # (n_vertices = |deg| rows; n_edges = sum(deg) div 2 — each
    # undirected edge contributes two degree units), so the deg exchange
    # is reused instead of paying a union re-scan + countDistinct
    # shuffle + full-count job (r11 action-census cut: 21 -> fewer
    # stages, identical values/hashes by construction).
    stats = deg.agg(
        F.expr("sum(deg) div 2").alias("n_edges"),
        F.count(F.lit(1)).alias("n_vertices"),
    )
    return tri.crossJoin(F.broadcast(stats)).select(
        "n_triangles", "n_edges", "n_vertices"
    )

# ---------------------------------------------------------------------------
# q_pagerank — fixed-point integer PageRank over the near-dup graph.
# ---------------------------------------------------------------------------

_PR_ITERS = 3
_PR_SCALE = 10**12  # rank stored as integer pico-units
_PR_D_NUM, _PR_D_DEN = 85, 100  # damping 0.85 as a ratio


def _pr_iter_sql(prev: str, out: str) -> str:
    # One synchronous PageRank step in pure BIGINT arithmetic: every
    # engine sums the same integers, so distributed float-addition order
    # can't flip the result (same trick as the fixed-point money aggs).
    return f"""
{out} AS (
  SELECT n.id,
         (({_PR_SCALE} * {_PR_D_DEN - _PR_D_NUM}) // {_PR_D_DEN}) // nn.n
         + ({_PR_D_NUM} * coalesce(inflow.s, 0)) // {_PR_D_DEN} AS r
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT e.d AS id, sum(p.r // deg.deg) AS s
    FROM edges e JOIN {prev} p ON p.id = e.s JOIN deg ON deg.id = e.s
    GROUP BY e.d
  ) inflow ON inflow.id = n.id
)"""


_PAGERANK_ORACLE = (
    """
WITH nd AS MATERIALIZED ("""
    + _NEAR_DEDUP_ORACLE
    + f"""),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM nd
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM nd
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT s AS id, count(*) AS deg FROM edges GROUP BY s),
r0 AS (SELECT id, {_PR_SCALE} // nn.n AS r FROM nodes, nn),
"""
    + ",".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS))
    + f"""
SELECT id AS doc_id, CAST(r AS BIGINT) AS pr_e12 FROM r{_PR_ITERS}
"""
)


@register("q_pagerank", oracle=_PAGERANK_ORACLE)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 3 synchronous iterations) over the undirected
    near-dup pair graph, in integer fixed-point (pico-units) so engine
    parity is exact: rank/deg uses integer division, sums are integer
    sums (associative — no float-order hazard), damping is a ratio.

    Scale shape per iteration: one join of the edge list against the
    current rank vector + one groupBy(dst) — a single shuffle keyed by
    dst, identical to the label-propagation topology. Degrees and node
    count are computed once; the edge list is the session-cached pair
    index. At 100 TB the graph is the near-dup fraction of the corpus,
    not the corpus."""
    def build() -> DataFrame:
        # r12: localCheckpoint, not persist — the 3 iterations below
        # reference `edges` (and each prior rank vector) in one growing
        # tree, and with persist every reference pastes the pair store's
        # ~100-exchange cached lineage; the final localCheckpoint action
        # then optimizes 4+ copies of it (guide §3.3, the q_adamic_adar
        # cut). A LogicalRDD of the tiny edge list keeps each iteration's
        # plan constant-size. Cluster caveat: reliable checkpoint() where
        # executor loss must not force a rebuild.
        pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
        edges = pairs.union(
            pairs.select(F.col("doc_b"), F.col("doc_a"))
        ).toDF("s", "d").localCheckpoint()
        # One aggregation serves three roles: the degree table, the node
        # list (every touched node has deg >= 1, so deg's key set IS the
        # vertex set), and — via count() on the persisted result — the
        # scalar n. The previous shape ran a separate distinct()+count()
        # job over the edge list before computing degrees: one full extra
        # pass over the edges per build, pure overlap with the deg agg.
        deg = (
            edges.groupBy(F.col("s").alias("id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .persist()
        )
        n = deg.count()
        nodes = deg.select("id")
        base = (_PR_SCALE * (_PR_D_DEN - _PR_D_NUM)) // _PR_D_DEN // n
        ranks = nodes.select("id", F.lit(_PR_SCALE // n).alias("r"))
        for _ in range(_PR_ITERS):
            inflow = (
                edges.join(ranks.withColumnRenamed("id", "s"), "s")
                .join(F.broadcast(deg.withColumnRenamed("id", "s")), "s")
                .groupBy(F.col("d").alias("id"))
                .agg(F.sum(F.expr("r div deg")).alias("inflow"))
            )
            ranks = nodes.join(inflow, "id", "left").select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"{_PR_D_NUM} * coalesce(inflow, 0L) div {_PR_D_DEN}")
                ).alias("r"),
            )
        # Materialize the converged ranks, then free the deg cache —
        # iterations are done; only the result outlives the build (the
        # checkpointed edge RDD is GC'd once unreferenced).
        ranks = ranks.localCheckpoint()
        deg.unpersist()
        return ranks.select(F.col("id").alias("doc_id"), F.col("r").alias("pr_e12"))

    # Ranks are an index-like artifact: 3 iterations build once per
    # (session, sf); repeat invocations probe the cached result.
    return session_persisted(spark, ("pagerank_ranks", sf_dir), build)

# ---------------------------------------------------------------------------
# q_corpus_temperature — temperature-scaled multi-source sampling weights.
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.7

_CORPUS_TEMPERATURE_ORACLE = f"""
WITH per_source AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS t FROM per_source),
scaled AS (
  SELECT source, n_docs, n_tokens,
         n_tokens * 1.0 / tot.t AS share,
         pow(n_tokens * 1.0 / tot.t, {_TEMP_ALPHA}) AS w
  FROM per_source, tot
),
z AS (SELECT sum(w) AS z FROM scaled)
SELECT source, n_docs, n_tokens,
       round(share, 6)   AS token_share,
       round(w / z.z, 6) AS mix_weight
FROM scaled, z
"""


@register("q_corpus_temperature", oracle=_CORPUS_TEMPERATURE_ORACLE)
def q_corpus_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (w_i ∝ share_i^0.7) — the
    standard multi-corpus sampling-weight computation for training-data
    pipelines: upweights small sources, downweights dominant ones.
    One groupBy(source) plus two single-row broadcast aggregates; the
    normalizer sums ~|sources| doubles on the driver-free path (the
    20-source weight vector is the only non-integer aggregation, small
    enough that summation order is a non-issue: one partial per source)."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
    )
    per_source = per_source.crossJoin(
        F.broadcast(per_source.agg(F.sum("n_tokens").alias("t")))
    ).withColumn("share", F.col("n_tokens") * 1.0 / F.col("t"))
    scaled = per_source.withColumn("w", F.pow("share", _TEMP_ALPHA))
    z = scaled.agg(F.sum("w").alias("z"))
    return scaled.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("share", 6).alias("token_share"),
        F.round(F.col("w") / F.col("z"), 6).alias("mix_weight"),
    )

# ---------------------------------------------------------------------------
# q_feature_hash — hashing-trick featurization of categorical columns.
# ---------------------------------------------------------------------------

_FH_BUCKETS = 32

_FEATURE_HASH_ORACLE = f"""
SELECT
  ('0x' || substr(md5(source || '|' || lang), 1, 15))::BIGINT % {_FH_BUCKETS}
    AS bucket,
  count(*) AS n_docs,
  count(DISTINCT source) AS n_sources
FROM documents
GROUP BY 1
"""


@register("q_feature_hash", oracle=_FEATURE_HASH_ORACLE)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: categorical (source, lang) pairs land in a
    fixed 32-bucket feature space via md5 — no vocabulary build, no
    fit/transform state, unbounded cardinality handled in O(1) memory.
    Map-side hash + one groupBy(bucket); cross-engine identical via the
    same hex-literal bigint derivation as q_rolling_hash."""
    docs = load_table(spark, sf_dir, "documents")
    # concat (NULL-propagating, like SQL ||), NOT concat_ws (NULL-
    # skipping): a NULL lang must land in the NULL bucket on both
    # engines, not silently hash as if the column were absent.
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("source"), F.lit("|"), F.col("lang")).cast(
                        "binary"
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % _FH_BUCKETS
    )
    return (
        docs.select(bucket.alias("bucket"), "source")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
    )

# ---------------------------------------------------------------------------
# q_regex_tokens — BPE-ish regex token counting beside whitespace counting.
# ---------------------------------------------------------------------------

# GPT-2-style pre-tokenizer shape reduced to a portable alternation (runs
# identically under Java regex and DuckDB's RE2): letter runs, digit
# runs, and runs of anything else except spaces.
_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]+"

_REGEX_TOKENS_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT)                AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS re_tokens,
       round(len(regexp_extract_all(text, '{_BPE_PATTERN}')) * 1.0
             / len(string_split(text, ' ')), 4)                    AS fertility
FROM documents
"""


@register("q_regex_tokens", oracle=_REGEX_TOKENS_ORACLE)
def q_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    pre-tokenization; `fertility` (regex tokens per word) is the
    standard proxy for how many subword units a tokenizer will emit.
    Map-only over the corpus — no shuffle at all, the ideal 100 TB
    shape; regexp_extract_all runs codegen'd in the JVM scan."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(tokens("text")).cast("bigint")
    re_n = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    ).cast("bigint")
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        re_n.alias("re_tokens"),
        F.round(re_n * 1.0 / ws, 4).alias("fertility"),
    )

# ---------------------------------------------------------------------------
# q_embed_quantize — int8 symmetric quantization of the embedding
# column: per-vector scale = max|x|/127, codes q_i = clamp(floor(x_i /
# scale + 0.5), -127, 127) — the vector-store compression step that cuts
# ANN index memory 4x (f32 -> i8) at a bounded recall cost, reported
# here as the max absolute reconstruction error per vector. Everything
# is engine-exact by construction: floor(+0.5) half-up is identical in
# both engines (no round() dialect hazard), code sums are integer sums,
# and the error is floored to e6 fixed-point instead of rounded. Scale
# path: pure per-row column math (map-only, no shuffle) — at 100 TB this
# is a projection over the embedding scan feeding the PQ/IVF builders.
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH q AS (
  SELECT vec_id,
         embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
           AS scale
  FROM embeddings
),
codes AS (
  SELECT vec_id, scale,
         list_transform(v, x ->
           greatest(-127, least(127, CAST(floor(x / scale + 0.5) AS BIGINT))))
           AS code,
         v
  FROM q
  WHERE scale > 0
)
SELECT vec_id,
       CAST(floor(scale * 1000000000) AS BIGINT)      AS scale_e9,
       CAST(list_aggregate(code, 'sum') AS BIGINT)    AS code_sum,
       CAST(floor(list_max(list_transform(range(1, len(v) + 1),
            i -> abs(v[i] - code[i] * scale))) * 1000000) AS BIGINT)
         AS max_abs_err_e6
FROM codes
"""


@register("q_embed_quantize", oracle=_QUANT_ORACLE)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double("embedding")
    scale = (
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("scale")
    q = emb.select("vec_id", v.alias("v"), scale).filter(F.col("scale") > 0)
    code = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127), F.floor(x / F.col("scale") + F.lit(0.5)).cast("long")
            ),
        ),
    )
    c = q.select("vec_id", "scale", "v", code.alias("code"))
    err = F.array_max(
        F.zip_with(
            F.col("v"),
            F.col("code"),
            lambda x, ci: F.abs(x - ci.cast("double") * F.col("scale")),
        )
    )
    return c.select(
        "vec_id",
        F.floor(F.col("scale") * 1e9).cast("long").alias("scale_e9"),
        F.aggregate(
            F.col("code"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("code_sum"),
        F.floor(err * 1e6).cast("long").alias("max_abs_err_e6"),
    )

# ---------------------------------------------------------------------------
# q_bpe_pairs — BPE vocabulary induction, merge step 0: count adjacent
# CHARACTER pairs across the corpus weighted by token frequency and
# rank the top 20 merge candidates — the inner loop of byte-pair-
# encoding tokenizer training (the highest-count pair becomes the first
# merge). Two-stage shape that scales: token frequencies first (shuffle
# keyed by token — corpus-size reduce to vocab-size), THEN pair
# expansion over the DISTINCT vocab (len(vocab) × token-length rows,
# tiny vs corpus), pair counts weighted by freq. Expansion uses the
# codegen explode(sequence)+substring idiom, not an interpreted HOF.
# Ties at the top-20 cut break on (count, pair) — deterministic across
# engines by construction.
# ---------------------------------------------------------------------------

_BPE_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (
  SELECT t, count(*) AS freq FROM tok WHERE len(t) >= 2 GROUP BY t
),
pairs AS (
  SELECT substr(t, CAST(i AS INT), 2) AS pair, freq
  FROM tf CROSS JOIN unnest(range(1, len(t))) AS u(i)
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


@register("q_bpe_pairs", oracle=_BPE_ORACLE)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.length("t") >= 2)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = tf.select(
        "freq",
        "t",
        F.explode(F.sequence(F.lit(1), F.length("t") - 1)).alias("i"),
    ).select("freq", F.substring(F.col("t"), F.col("i"), F.lit(2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )

# ---------------------------------------------------------------------------
# q_bpe_tokenize — BPE merge training UNROLLED (4 rounds) plus the
# APPLY half (r5 verdict item 2): learn the first 4 byte-pair merges on
# the word-type vocabulary, apply them, and report per-source corpus
# token counts under the learned merges — the step every training
# pipeline runs after q_bpe_pairs picks merge 0. Each word becomes a
# space-separated symbol sequence (' h e l l o '); a merge round is
# (1) count adjacent symbol pairs weighted by word frequency,
# (2) argmax on (count DESC, pair ASC) — deterministic across engines,
# (3) one left-to-right non-overlapping replace of ' a b ' -> ' ab '
#     per word (Spark `replace` and DuckDB `replace` share exactly this
#     single-pass scan semantic, so both engines produce byte-identical
#     sequences; within-round overlap re-scanning — ' a a a a ' ->
#     ' aa aa ' — is deliberately NOT done, matching neither engine's
#     single replace; real trainers get the second 'aa' on the next
#     round that picks the pair again).
#
# Scale shape: the corpus-sized work is ONE reduce (word -> frequency,
# session-persisted so the 4 rounds and final apply never rescan the
# corpus) and one final broadcast-join of the learned vocab back onto
# the exploded corpus for per-source counts. The merge rounds operate
# on the VOCABULARY (thousands of rows where the corpus has billions);
# merge selection collects exactly ONE row per round to the driver —
# bounded state, exactly how production BPE trainers checkpoint their
# merge table; at real scale you would run thousands of rounds with the
# same loop shape, writing the merge table as it grows. The `merges`
# output column pins the learned merge SEQUENCE cross-engine, not just
# the final counts.
# ---------------------------------------------------------------------------

_BPE_TOKENIZE_ROUNDS = 4

# One CTE chain per round: p_i counts pairs over r_i, m_i is the argmax,
# r_{i+1} applies it. The chain is the oracle-side mirror of the
# driver-side loop; both argmax on (n DESC, pair ASC) over exact
# integer counts.
def _bpe_tokenize_oracle() -> str:
    parts = [
        """
WITH r0 AS (
  SELECT t AS w, count(*) AS freq,
         ' ' || regexp_replace(t, '(.)', '\\1 ', 'g') AS seq
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t
)"""
    ]
    for i in range(_BPE_TOKENIZE_ROUNDS):
        parts.append(
            f""",
p{i} AS (
  SELECT s[CAST(i AS INT)] || ' ' || s[CAST(i AS INT) + 1] AS pair,
         CAST(sum(freq) AS BIGINT) AS n
  FROM (SELECT freq, string_split(trim(seq), ' ') AS s FROM r{i})
  CROSS JOIN unnest(range(1, len(s))) AS u(i)
  WHERE len(s) >= 2
  GROUP BY 1
),
m{i} AS (SELECT pair FROM p{i} ORDER BY n DESC, pair LIMIT 1),
r{i + 1} AS (
  SELECT w, freq,
         replace(seq, ' ' || m{i}.pair || ' ',
                 ' ' || replace(m{i}.pair, ' ', '') || ' ') AS seq
  FROM r{i} CROSS JOIN m{i}
)"""
        )
    last = _BPE_TOKENIZE_ROUNDS
    merge_cols = ", ".join(f"m{i}.pair" for i in range(_BPE_TOKENIZE_ROUNDS))
    merge_joins = " ".join(f"CROSS JOIN m{i}" for i in range(_BPE_TOKENIZE_ROUNDS))
    parts.append(
        f""",
vocab AS (
  SELECT w, len(string_split(trim(seq), ' ')) AS n_syms FROM r{last}
)
SELECT d.source,
       count(*) AS n_words,
       CAST(sum(len(d.t)) AS BIGINT) AS n_chars,
       CAST(sum(v.n_syms) AS BIGINT) AS n_bpe_tokens,
       concat_ws('+', {merge_cols}) AS merges
FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents) d
JOIN vocab v ON v.w = d.t
{merge_joins}
GROUP BY d.source, merges
"""
    )
    return "".join(parts)


@register("q_bpe_tokenize", oracle=_bpe_tokenize_oracle())
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    word_tf = session_persisted(
        spark,
        ("bpe_word_tf", sf_dir),
        lambda: load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "w",
            "freq",
            F.concat(
                F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")
            ).alias("seq"),
        ),
    )

    def pair_counts(r: DataFrame) -> DataFrame:
        syms = r.select("freq", F.split(F.trim(F.col("seq")), " ").alias("s"))
        return (
            syms.filter(F.size("s") >= 2)
            .select(
                "freq",
                "s",
                F.explode(
                    F.sequence(F.lit(1), F.size("s") - 1)
                ).alias("i"),
            )
            .select(
                "freq",
                F.concat(
                    F.element_at("s", F.col("i")),
                    F.lit(" "),
                    F.element_at("s", F.col("i") + 1),
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("n"))
        )

    r = word_tf
    merges: list[str] = []
    for _ in range(_BPE_TOKENIZE_ROUNDS):
        # ONE row to the driver per round — the merge-table checkpoint.
        top = pair_counts(r).orderBy(F.desc("n"), F.asc("pair")).first()
        pair = top["pair"]
        merges.append(pair)
        merged = pair.replace(" ", "")
        r = r.withColumn(
            "seq",
            F.replace(
                F.col("seq"), F.lit(f" {pair} "), F.lit(f" {merged} ")
            ),
        )

    vocab = r.select(
        "w", F.size(F.split(F.trim(F.col("seq")), " ")).alias("n_syms")
    )
    corpus = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    return (
        corpus.join(F.broadcast(vocab), "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).cast("long").alias("n_chars"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn("merges", F.lit("+".join(merges)))
    )

# ---------------------------------------------------------------------------
# q_mmr_diversify — Maximal Marginal Relevance re-ranking: greedily pick
# k=5 results from the top-20 cosine shortlist, each step maximizing
# relevance MINUS max-similarity-to-already-picked (lambda = 1/2, where
# argmax(l*rel - (1-l)*red) == argmax(rel - red)) — the diversity
# re-ranker that stops retrieval returning five near-copies of the same
# document (directly relevant to dedup-aware RAG/eval sets). All
# similarities are floored to e6 fixed-point BEFORE the greedy loop and
# ties break on vec_id, so the argmax sequence is engine-exact. Scale
# shape: the distributed work is the shortlist scan (TakeOrdered top-20)
# and a 20x20 pairwise block; the greedy loop itself runs driver-side
# over those <=400 collected rows — bounded by k and shortlist size by
# construction, like the PQ codebook collect (per-query rerank state,
# never corpus-proportional). Oracle: the same five steps unrolled as
# chained CTEs — no recursion, bit-identical folds.
# ---------------------------------------------------------------------------


def _cos_sql(a: str, b: str) -> str:
    dot = (
        f"list_aggregate(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a})[i] * ({b})[i]), 'sum')"
    )
    na = f"list_aggregate(list_transform({a}, x -> x * x), 'sum')"
    nb = f"list_aggregate(list_transform({b}, x -> x * x), 'sum')"
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def _mmr_oracle() -> str:
    steps = []
    prev_sets = []
    for step in range(2, 6):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM s{i}" for i in range(1, step))
        steps.append(f"""
c{step} AS (
  SELECT sv.vec_id, sv.rel_e6, max(sims.sim_e6) AS ms
  FROM sv
  JOIN sims ON sims.va = sv.vec_id AND sims.vb IN ({prev})
  WHERE sv.vec_id NOT IN ({prev})
  GROUP BY sv.vec_id, sv.rel_e6
),
s{step} AS (
  SELECT vec_id, rel_e6, ms FROM c{step}
  ORDER BY rel_e6 - ms DESC, vec_id LIMIT 1
)""")
        prev_sets.append(prev)
    picks = " UNION ALL ".join(
        [f"SELECT 1 AS rank, vec_id, rel_e6, CAST(0 AS BIGINT) AS redundancy_e6 FROM s1"]
        + [
            f"SELECT {i} AS rank, vec_id, rel_e6, ms AS redundancy_e6 FROM s{i}"
            for i in range(2, 6)
        ]
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
probe AS (SELECT v AS p FROM e WHERE vec_id = 0),
rel AS (
  SELECT e.vec_id,
         CAST(floor({_cos_sql('e.v', 'probe.p')} * 1000000) AS BIGINT) AS rel_e6
  FROM e CROSS JOIN probe WHERE e.vec_id <> 0
),
short AS (SELECT vec_id, rel_e6 FROM rel ORDER BY rel_e6 DESC, vec_id LIMIT 20),
sv AS (SELECT s.vec_id, s.rel_e6, e.v FROM short s JOIN e USING (vec_id)),
sims AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(floor({_cos_sql('a.v', 'b.v')} * 1000000) AS BIGINT) AS sim_e6
  FROM sv a JOIN sv b ON a.vec_id <> b.vec_id
),
s1 AS (SELECT vec_id, rel_e6 FROM sv ORDER BY rel_e6 DESC, vec_id LIMIT 1),
{",".join(steps)}
{picks}
"""


@register("q_mmr_diversify", oracle=_mmr_oracle())
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
    probe = vecs.filter(F.col("vec_id") == 0).select(F.col("v").alias("p"))
    rel_e6 = F.floor(cosine(F.col("v"), F.col("p")) * 1e6).cast("long")
    short = (
        vecs.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", "v", rel_e6.alias("rel_e6"))
        .orderBy(F.desc("rel_e6"), F.asc("vec_id"))
        .limit(20)
    )
    a = short.select(
        F.col("vec_id").alias("va"), F.col("v").alias("xa"), "rel_e6"
    )
    b = short.select(F.col("vec_id").alias("vb"), F.col("v").alias("xb"))
    sims = (
        a.join(b, F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            F.floor(cosine(F.col("xa"), F.col("xb")) * 1e6)
            .cast("long")
            .alias("sim_e6"),
        )
        .collect()
    )
    rels = {r.va: r.rel_e6 for r in a.select("va", "rel_e6").collect()}
    sim = {(r.va, r.vb): r.sim_e6 for r in sims}
    # Greedy MMR over the collected <=400-entry block (bounded by k and
    # the shortlist — per-query rerank state, never corpus-sized).
    first = max(rels, key=lambda v: (rels[v], -v))
    picked = [(1, first, rels[first], 0)]
    chosen = [first]
    for rank in range(2, 6):
        best = None
        for v, r in rels.items():
            if v in chosen:
                continue
            ms = max(sim[(v, c)] for c in chosen)
            key = (r - ms, -v)
            if best is None or key > best[0]:
                best = (key, v, r, ms)
        if best is None:
            # Shortlist exhausted (< k+1 candidate vectors, e.g. a tiny
            # embeddings table): emit only the picks actually made — the
            # oracle's LIMIT-1 steps likewise produce no row.
            break
        picked.append((rank, best[1], best[2], best[3]))
        chosen.append(best[1])
    return spark.createDataFrame(
        picked, "rank int, vec_id bigint, rel_e6 bigint, redundancy_e6 bigint"
    )

# ---------------------------------------------------------------------------
# q_rrf_fusion — hybrid retrieval via reciprocal-rank fusion (Cormack et
# al.): the BM25 keyword top-20 (q_bm25's exact construction) and the
# embedding-cosine top-20 against probe vector 0 (q_knn_self's) are
# fused by RRF(d) = Σ_lists 1/(60 + rank_list(d)), the standard way a
# production retrieval stack combines sparse and dense scores without
# tuning. The per-list term is integer fixed-point (1e6 div (60+rank)),
# so the fused score is an exact BIGINT in both engines; ranks are
# computed over the 4dp-ROUNDED scores with id tiebreak, so last-ulp
# float noise cannot flip a rank. Scale shape: both candidate lists are
# top-k results (TakeOrderedAndProject over the corpus — no global
# sort); everything after is a 40-row driver-sized fusion.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOP = 20

_RRF_ORACLE = f"""
WITH bm AS ({_BM25_ORACLE}),
bmr AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm
  FROM bm
),
probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
cos20 AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], probe.p), 4) AS cs
  FROM embeddings e CROSS JOIN probe
  WHERE e.vec_id <> 0
  ORDER BY cs DESC, e.vec_id
  LIMIT {_RRF_TOP}
),
cr AS (
  SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id) AS r_cos
  FROM cos20
),
fused AS (
  SELECT coalesce(bmr.doc_id, cr.doc_id) AS doc_id, bmr.r_bm, cr.r_cos,
         coalesce(1000000 // (60 + bmr.r_bm), 0)
           + coalesce(1000000 // (60 + cr.r_cos), 0) AS rrf_e6
  FROM bmr FULL OUTER JOIN cr ON cr.doc_id = bmr.doc_id
)
SELECT doc_id,
       CAST(coalesce(r_bm, 0) AS BIGINT) AS bm25_rank,
       CAST(coalesce(r_cos, 0) AS BIGINT) AS cos_rank,
       CAST(rrf_e6 AS BIGINT) AS rrf_e6
FROM fused
ORDER BY rrf_e6 DESC, doc_id
LIMIT 10
"""


@register("q_rrf_fusion", oracle=_RRF_ORACLE)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from data_ingestion_service_spark.registry import QUERIES

    bm = QUERIES["q_bm25"](spark, sf_dir)
    # 20-row ranked lists: single-partition windows are driver-sized by
    # construction (top-k already ran distributed upstream).
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r_bm"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double("embedding").alias("p")
    )
    cos20 = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(as_double("embedding"), F.col("p")), 4).alias("cs"),
        )
        .orderBy(F.desc("cs"), F.asc("doc_id"))
        .limit(_RRF_TOP)
    )
    cr = cos20.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cs"), F.asc("doc_id")))
        .alias("r_cos"),
    )
    fused = bmr.join(cr, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce(F.col("r_bm"), F.lit(0)).cast("bigint").alias("bm25_rank"),
        F.coalesce(F.col("r_cos"), F.lit(0)).cast("bigint").alias("cos_rank"),
        (
            F.coalesce(F.expr(f"1000000 div ({_RRF_K} + r_bm)"), F.lit(0))
            + F.coalesce(F.expr(f"1000000 div ({_RRF_K} + r_cos)"), F.lit(0))
        )
        .cast("bigint")
        .alias("rrf_e6"),
    )
    return fused.orderBy(F.desc("rrf_e6"), F.asc("doc_id")).limit(10)

# ---------------------------------------------------------------------------
# q_dsir_weights — DSIR importance-resampling weights (Xie et al., "Data
# Selection for Language Models via Importance Resampling"): hashed
# bigram features (8192 buckets, the paper's hashed n-gram model), a
# target distribution estimated from the held-out split and a raw
# distribution from the train split (q_train_test_split's hash split),
# and per-raw-doc log importance weight Σ_features log(p_target/p_raw)
# with add-1 smoothing. The per-bucket log-ratio is floored to e6
# fixed-point BEFORE the per-doc sum (q_lm_score's discipline), so the
# weight is an associative BIGINT sum — immune to distributed
# accumulation order. Scale shape: the model is ≤8192 rows regardless
# of corpus size (broadcast by construction); two shuffles — bucket
# counts and the per-doc sum. At petabyte counts the smoothed ratio
# should be computed in log space (log2 of each factor) to keep the
# intermediate products under 2^53; at any realizable fixture tier the
# single-log2 exact-integer-ratio form used here is bit-identical
# across engines.
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 8192

_DSIR_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_raw
  FROM documents
),
bi AS (
  SELECT doc_id, is_raw,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
           AS bg
  FROM tagged WHERE len(t) >= 2
),
bb AS (
  SELECT doc_id, is_raw,
         ('0x' || substr(md5(bg), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS b
  FROM bi
),
cnt AS (
  SELECT b,
         CAST(sum(CASE WHEN is_raw THEN 1 ELSE 0 END) AS BIGINT) AS rc,
         CAST(sum(CASE WHEN is_raw THEN 0 ELSE 1 END) AS BIGINT) AS tc
  FROM bb GROUP BY b
),
tot AS (
  SELECT CAST(sum(rc) AS BIGINT) AS r_tot, CAST(sum(tc) AS BIGINT) AS t_tot
  FROM cnt
),
terms AS (
  SELECT b,
         CAST(floor(log2(
           ((tc + 1.0) * (r_tot + {_DSIR_BUCKETS}.0))
           / ((rc + 1.0) * (t_tot + {_DSIR_BUCKETS}.0))
         ) * 1000000) AS BIGINT) AS term_e6
  FROM cnt CROSS JOIN tot
)
SELECT doc_id,
       count(*) AS n_feats,
       CAST(sum(term_e6) AS BIGINT) AS weight_e6
FROM bb JOIN terms USING (b)
WHERE is_raw
GROUP BY doc_id
"""


@register("q_dsir_weights", oracle=_DSIR_ORACLE)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_raw = (
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
        < "c"
    )
    tagged = docs.select("doc_id", is_raw.alias("is_raw"))
    bb = (
        shingle_rows(docs, 2)
        .join(tagged, "doc_id")
        .select(
            "doc_id",
            "is_raw",
            (
                F.conv(
                    F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15),
                    16,
                    10,
                ).cast("bigint")
                % _DSIR_BUCKETS
            ).alias("b"),
        )
    )
    # r11 optimization (guide §2.3/§2.4): bb (the md5-hashed bigram
    # stream) used to be consumed three times — the bucket counts, the
    # totals broadcast (which re-ran bucket counts), and the per-doc
    # scoring pass — so the corpus-sized hash work ran 3x (9 steady-
    # state jobs). One partial-aggregated exchange reduces the stream to
    # (doc_id, is_raw, b, k) instance counts; the ≤8192-row model
    # derives from that via a plain rollup with its totals as a WINDOW
    # (no broadcast-back), and the scoring pass re-reads the persisted
    # reduce instead of re-hashing the corpus.
    from pyspark.sql import Window

    dbk = call_persisted(
        bb.groupBy("doc_id", "is_raw", "b").agg(F.count(F.lit(1)).alias("k"))
    )
    cnt = dbk.groupBy("b").agg(
        F.sum(F.when(F.col("is_raw"), F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("rc"),
        F.sum(F.when(~F.col("is_raw"), F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("tc"),
    )
    w_all = Window.partitionBy()
    with_tot = cnt.select(
        "b",
        "rc",
        "tc",
        F.sum("rc").over(w_all).cast("bigint").alias("r_tot"),
        F.sum("tc").over(w_all).cast("bigint").alias("t_tot"),
    )
    ratio = ((F.col("tc") + 1.0) * (F.col("r_tot") + float(_DSIR_BUCKETS))) / (
        (F.col("rc") + 1.0) * (F.col("t_tot") + float(_DSIR_BUCKETS))
    )
    terms = with_tot.select(
        "b",
        F.floor(F.log2(ratio) * 1000000).cast("bigint").alias("term_e6"),
    )
    # The model table is bounded by the bucket count (<= 8192 rows) no
    # matter the corpus size — broadcast it into the feature stream.
    return (
        dbk.filter(F.col("is_raw"))
        .join(F.broadcast(terms), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_feats"),
            F.sum(F.col("k") * F.col("term_e6")).cast("bigint").alias("weight_e6"),
        )
    )

# ---------------------------------------------------------------------------
# q_doc_chunking — fixed-size overlapping token chunking (the RAG /
# embedding-pipeline primitive): each document becomes ceil-strided
# chunks of 32 tokens with stride 24 (8-token overlap), each chunk
# carrying its token count and an md5 checksum of its joined text so
# the chunk CONTENT is verified cross-engine, not just the counts.
# Map-only explode(sequence)+slice — no shuffle at all, the ideal
# 100 TB shape; downstream embedding/indexing stages consume the chunk
# stream partition-parallel.
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24

_CHUNKING_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
c AS (
  SELECT doc_id,
         unnest(range(0, (len(t) - 1) // {_CHUNK_STRIDE} + 1)) AS chunk_id,
         t
  FROM toks
)
SELECT doc_id, chunk_id,
       CAST(len(t[chunk_id * {_CHUNK_STRIDE} + 1 :
                  chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}]) AS BIGINT)
         AS n_tokens,
       md5(list_aggregate(t[chunk_id * {_CHUNK_STRIDE} + 1 :
                            chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}],
                          'string_agg', ' ')) AS chunk_md5
FROM c
"""


@register("q_doc_chunking", oracle=_CHUNKING_ORACLE)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens("text").alias("t"))
    c = toked.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(0, (size(t) - 1) div {_CHUNK_STRIDE})")
        ).alias("chunk_id"),
        "t",
    )
    chunk = F.slice(
        F.col("t"), F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_SIZE
    )
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_md5"),
    )

# ---------------------------------------------------------------------------
# q_contrastive_triplets — training-pair mining for embedding models
# (SimCSE/E5-style): each near-dup anchor yields one (anchor, positive,
# negative) triplet — positive = its lowest-id near-duplicate, negative
# = the lowest-id SAME-SOURCE document that is neither the anchor nor
# any of the anchor's near-dup partners (an in-domain hard-ish negative
# rather than a trivially-unrelated one). Deterministic by construction
# (min-id choices), so both engines emit identical triplets. Scale
# shape: anchors are pair-index-sized (small) and broadcast into the
# corpus scan; the exclusion is a result-sized anti-join; nothing
# corpus×corpus.
# ---------------------------------------------------------------------------

_CONTRASTIVE_ORACLE = (
    "WITH nd AS MATERIALIZED ("
    + _NEAR_DEDUP_ORACLE
    + """),
anchors AS (
  SELECT doc_a AS anchor, min(doc_b) AS positive FROM nd GROUP BY doc_a
),
partners AS (
  SELECT doc_a AS anchor, doc_b AS partner FROM nd
  UNION ALL
  SELECT doc_b, doc_a FROM nd
),
asrc AS (
  SELECT a.anchor, a.positive, d.source
  FROM anchors a JOIN documents d ON d.doc_id = a.anchor
),
cands AS (
  SELECT s.anchor, s.positive, d.doc_id AS cand
  FROM asrc s JOIN documents d ON d.source = s.source
  WHERE d.doc_id <> s.anchor
    AND NOT EXISTS (SELECT 1 FROM partners p
                    WHERE p.anchor = s.anchor AND p.partner = d.doc_id)
)
SELECT anchor, positive, min(cand) AS negative
FROM cands
GROUP BY anchor, positive
"""
)


@register("q_contrastive_triplets", oracle=_CONTRASTIVE_ORACLE)
def q_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    anchors = (
        pairs.groupBy("doc_a")
        .agg(F.min("doc_b").alias("positive"))
        .withColumnRenamed("doc_a", "anchor")
    )
    partners = pairs.select(
        F.col("doc_a").alias("anchor"), F.col("doc_b").alias("partner")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("anchor"), F.col("doc_a").alias("partner"))
    )
    asrc = anchors.join(
        docs.withColumnRenamed("doc_id", "anchor"), "anchor"
    )
    # Pair-index-sized anchor table broadcasts into the corpus scan; each
    # corpus row meets only its source's anchors.
    cands = docs.join(F.broadcast(asrc), "source").filter(
        F.col("doc_id") != F.col("anchor")
    )
    cands = cands.join(
        F.broadcast(partners),
        (cands["anchor"] == partners["anchor"])
        & (cands["doc_id"] == partners["partner"]),
        "left_anti",
    )
    return cands.groupBy("anchor", "positive").agg(
        F.min("doc_id").alias("negative")
    )

# ---------------------------------------------------------------------------
# q_adamic_adar — Adamic-Adar link prediction over the near-dup pair
# graph: for every vertex pair sharing ≥1 common neighbor, AA(u,v) =
# Σ_w 1/ln(deg(w)) over common neighbors w — the classic "which
# documents will turn out to be duplicates next" score (missing-edge
# prediction over the dedup graph; a high-AA non-edge is a pair the
# banded LSH likely MISSED — an audit lens on recall, complementing
# q_lsh_recall's measured view).
#
# Exactness: deg is an exact BIGINT; each common-neighbor term
# floor(1e6/ln(deg)) is floored to e6 BEFORE the per-pair sum, so the
# score is an associative integer sum. is_edge marks pairs the graph
# already contains.
#
# Scale: wedge enumeration per center is quadratic in center degree —
# the same hazard the triangle count neutralizes by degree ordering;
# here dense dup-blob centers are CAPPED at deg ≤ 32 (documented lossy
# bound, identical in both engines — the hot-shingle-cap discipline):
# a center already that dense predicts nothing new about its blob.
# The pair graph itself is result-sized (session-persisted index).
# ---------------------------------------------------------------------------

_AA_MAX_DEG = 32

_ADAMIC_ADAR_ORACLE = (
    "WITH nd AS MATERIALIZED ("
    + _NEAR_DEDUP_ORACLE
    + f"""),
e AS (SELECT doc_a AS a, doc_b AS b FROM nd),
und AS (SELECT a AS v, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT v AS w, count(*) AS d FROM und GROUP BY v),
terms AS (
  SELECT u1.nbr AS u, u2.nbr AS vtx,
         CAST(floor(1000000 / ln(deg.d)) AS BIGINT) AS term_e6
  FROM und u1
  JOIN und u2 ON u1.v = u2.v AND u1.nbr < u2.nbr
  JOIN deg ON deg.w = u1.v AND deg.d <= {_AA_MAX_DEG}
),
scored AS (
  SELECT u, vtx,
         count(*) AS n_common,
         CAST(sum(term_e6) AS BIGINT) AS aa_e6
  FROM terms GROUP BY u, vtx
)
SELECT s.u AS doc_u, s.vtx AS doc_v, s.n_common, s.aa_e6,
       (e.a IS NOT NULL) AS is_edge
FROM scored s
LEFT JOIN e ON e.a = s.u AND e.b = s.vtx
"""
)


@register("q_adamic_adar", oracle=_ADAMIC_ADAR_ORACLE)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 optimization (guide §3.3 "very large plans"): the pair store's
    # cached lineage is a ~100-exchange analyzed tree, and this key
    # references it three times (both und directions + the edge flag) —
    # 420 exchange nodes in the printed plan, with optimizer time
    # dominating a result-sized graph computation. localCheckpoint
    # truncates the lineage to a LogicalRDD: one bounded materialization
    # of the tiny pair list per call, constant-size plan after.
    e = (
        near_dup_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint()
    )
    und = e.select(F.col("a").alias("v"), F.col("b").alias("nbr")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
    )
    deg = und.groupBy(F.col("v").alias("w")).agg(F.count(F.lit(1)).alias("d"))
    u2 = und.select(F.col("v").alias("v2"), F.col("nbr").alias("nbr2"))
    terms = (
        und.join(u2, (F.col("v") == F.col("v2")) & (F.col("nbr") < F.col("nbr2")))
        .join(
            deg.filter(F.col("d") <= _AA_MAX_DEG),
            F.col("v") == F.col("w"),
        )
        .select(
            F.col("nbr").alias("u"),
            F.col("nbr2").alias("vtx"),
            F.floor(1000000 / F.log(F.col("d"))).cast("bigint").alias("term_e6"),
        )
    )
    scored = terms.groupBy("u", "vtx").agg(
        F.count(F.lit(1)).alias("n_common"),
        F.sum("term_e6").cast("bigint").alias("aa_e6"),
    )
    edge_flag = e.select(
        F.col("a").alias("u"), F.col("b").alias("vtx"), F.lit(True).alias("is_edge")
    )
    return (
        scored.join(edge_flag, ["u", "vtx"], "left")
        .select(
            F.col("u").alias("doc_u"),
            F.col("vtx").alias("doc_v"),
            "n_common",
            "aa_e6",
            F.coalesce("is_edge", F.lit(False)).alias("is_edge"),
        )
    )

# ---------------------------------------------------------------------------
# q_random_projection — Johnson–Lindenstrauss sign projection with its
# distortion MEASURED (the q_lsh_recall / q_kmv_overlap discipline):
# project the 64-dim embeddings onto 8 dims with a deterministic ±1
# matrix (sign = md5(j|i) parity — a pure function, identical literal
# construction in both engines), then audit, for the 190 probe pairs
# (vec_id < 20), the projected squared distance against the original:
# for a ±1 matrix E[(y_a−y_b)_j²] = ‖x_a−x_b‖², so proj_d2 / (k·orig_d2)
# concentrates around 1 — the ratio IS the JL guarantee, shipped as
# data. This is the dim-reduction step a 100 TB ANN pipeline runs
# before indexing when 64 f32 dims are still too fat to shuffle.
#
# Exactness: vectors quantize to e6 BIGINTs (floor(x·1e6 + 0.5) half-up
# — no round() dialect hazard); projections are exact integer sums of
# signed e6 values; squared distances are exact BIGINTs (≤ ~1.3e17,
# BIGINT-safe); the single ratio is one fixed-parenthesization double
# over two exact integers, floored to e6, with greatest(orig,1)
# guarding identical vectors.
#
# Scale: the projection is MAP-ONLY per vector (explode dims × 8 output
# dims → one vec_id-keyed partial-agg reduce; at 100 TB the sign matrix
# would be a 512-row broadcast instead of an inline md5 per row, same
# result); the audit joins only the probe slice (vec_id < 20 — pushed
# to the scan). Nothing all-pairs: probe pairs are dimension-bounded.
# ---------------------------------------------------------------------------

_RP_K = 8  # output dims
_RP_PROBES = 20

# sign(j, i) = +1 when the first md5 nibble of "j|i" is even
_RP_SIGN_SQL = (
    "(CASE WHEN ('0x' || substr(md5(CAST({j} AS VARCHAR) || '|' ||"
    " CAST({i} AS VARCHAR)), 1, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END)"
)

_RP_ORACLE = f"""
WITH probes AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS xe
  FROM embeddings
  WHERE vec_id < {_RP_PROBES}
),
flat AS (
  SELECT vec_id, i, xe[i] AS x
  FROM probes, unnest(range(1, {64 + 1})) AS t(i)
),
proj AS (
  SELECT f.vec_id, j.j,
         CAST(sum({_RP_SIGN_SQL.format(j="j.j", i="f.i")} * f.x) AS BIGINT)
           AS y
  FROM flat f CROSS JOIN (SELECT unnest(range(0, {_RP_K})) AS j) j
  GROUP BY 1, 2
),
pd AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS proj_d2
  FROM proj a JOIN proj b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
od AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(list_sum(list_transform(range(1, {64 + 1}),
              i -> (a.xe[i] - b.xe[i]) * (a.xe[i] - b.xe[i]))) AS BIGINT)
           AS orig_d2
  FROM probes a JOIN probes b ON a.vec_id < b.vec_id
)
SELECT od.a_id, od.b_id, od.orig_d2, pd.proj_d2,
       CAST(floor(CAST(pd.proj_d2 AS DOUBLE) * 1000000.0
                  / ({_RP_K}.0 * CAST(greatest(od.orig_d2, 1) AS DOUBLE)))
            AS BIGINT) AS ratio_e6
FROM od JOIN pd ON pd.a_id = od.a_id AND pd.b_id = od.b_id
"""


@register("q_random_projection", oracle=_RP_ORACLE)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _RP_PROBES
    )
    xe = F.transform(
        as_double("embedding"),
        lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long"),
    )
    probes = emb.select("vec_id", xe.alias("xe"))
    flat = probes.select(
        "vec_id",
        F.posexplode("xe").alias("i0", "x"),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    fanned = flat.select(
        "vec_id",
        "i",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(_RP_K - 1))).alias("j"),
    )
    # Same value as _RP_SIGN_SQL, spelled in Spark's dialect: +1 when
    # the first md5 nibble of "j|i" is even.
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("j").cast("string"), F.col("i").cast("string")
                    ).cast("binary")
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    proj = (
        fanned.select("vec_id", "j", (sign * F.col("x")).alias("sx"))
        .groupBy("vec_id", "j")
        .agg(F.sum("sx").cast("bigint").alias("y"))
    )
    pa = proj.select(
        F.col("vec_id").alias("a_id"), "j", F.col("y").alias("ya")
    )
    pb = proj.select(
        F.col("vec_id").alias("b_id"), "j", F.col("y").alias("yb")
    )
    pd_ = (
        pa.join(pb, "j")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(
            F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
            .cast("bigint")
            .alias("proj_d2")
        )
    )
    oa = probes.select(F.col("vec_id").alias("a_id"), F.col("xe").alias("xa"))
    ob = probes.select(F.col("vec_id").alias("b_id"), F.col("xe").alias("xb"))
    od = (
        oa.join(ob, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.aggregate(
                F.zip_with(
                    "xa", "xb", lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("orig_d2"),
        )
    )
    return od.join(pd_, ["a_id", "b_id"]).select(
        "a_id",
        "b_id",
        "orig_d2",
        "proj_d2",
        F.floor(
            F.col("proj_d2").cast("double")
            * 1000000.0
            / (
                float(_RP_K)
                * F.greatest(F.col("orig_d2"), F.lit(1)).cast("double")
            )
        )
        .cast("bigint")
        .alias("ratio_e6"),
    )
