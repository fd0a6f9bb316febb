"""Round-4 corpus operators: the LSH/PQ similarity-search family
(bucketed ANN, multi-probe, product quantization), retrieval and
quality scoring (BM25, repetition fractions, bigram-LM scoring, token
entropy), dedup pipeline stages (contamination check, survivor
selection, pointer-jumping connected components, PageRank over the
near-dup graph), and training-mix tooling (temperature weights,
feature hashing, rolling-hash fingerprints, BPE-ish token counts).

These extend the LLM-training-data family (BASELINE.json:6 mandate; the
reference snapshot specifies nothing beyond its name, SURVEY.md §0):

  - q_knn_lsh: sign-random-projection LSH — the *bucketed* ANN scale
    path. Every vector gets a P-bit signature (sign of dot products with
    P fixed hyperplanes); search only compares vectors in the probe's
    bucket. At 100 TB the shuffle is keyed by bucket id and each bucket
    is a tiny fraction of the corpus (multiple band tables trade recall
    for recompute, exactly like MinHash banding — q_minhash_pairs).
  - q_repetition_score: Gopher-style repetition filters — the fraction
    of duplicated bigrams per document. Pure explode→count→agg, all
    JVM-side, two shuffles both keyed by doc_id.
  - q_contamination_check: test-set decontamination — test-split docs
    with a near-duplicate (3-shingle Jaccard) in the train split. Probes
    the session-cached near-dup pair index; the split is a pure hash of
    doc_id (q_train_test_split's idiom) so the check is reproducible.
  - q_bm25: classic BM25(k1=1.2, b=0.75) ranking of the corpus against
    a fixed conjunctive-free keyword query. Per-doc term frequencies are
    computed with array HOFs in one scan; corpus stats (N, avgdl, df)
    are two 1-row/3-row aggregates broadcast back — no explode, no
    shuffle proportional to corpus size beyond the top-k.
  - q_dup_clusters_pj: the pointer-jumping variant of connected
    components (label(v) <- label(label(v)) each round): O(log d)
    rounds on a diameter-d component vs O(d) for plain min-label
    propagation — the difference between 2 and 60 shuffles on a
    long-chain duplicate cluster at 100 TB.
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
from data_ingestion_service_spark.session import session_persisted

# ---------------------------------------------------------------------------
# q_knn_lsh — sign-random-projection (hyperplane) LSH bucketed ANN.
# ---------------------------------------------------------------------------

_LSH_PLANES = 4  # 4 sign bits -> 16 buckets
_LSH_DIM = 64

# Deterministic ±1 hyperplane components: sign(p, d) = +1 iff the first
# hex nibble of md5("p|d") is < '8'. Derived once here and inlined as
# literals into BOTH the Spark plan and the oracle SQL, so the two
# engines share the exact same hyperplanes by construction (same idiom
# as q_train_test_split's hash split: the hash is the spec).
_LSH_SIGNS: list[list[float]] = [
    [
        1.0 if hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0] < "8" else -1.0
        for d in range(_LSH_DIM)
    ]
    for p in range(_LSH_PLANES)
]


def _sql_plane(p: int) -> str:
    lits = ", ".join(str(int(v)) for v in _LSH_SIGNS[p])
    return f"[{lits}]::DOUBLE[]"


def _sql_proj(p: int) -> str:
    # Same left-to-right f64 fold as Spark's aggregate(zip_with(...)):
    # identical inputs -> bit-identical sums -> identical sign bits.
    return (
        f"list_aggregate(list_transform(range(1, {_LSH_DIM + 1}), "
        f"i -> e[i] * ({_sql_plane(p)})[i]), 'sum')"
    )


_KNN_LSH_ORACLE = f"""
WITH sigs AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         {" + ".join(f"(CASE WHEN {_sql_proj(p)} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(_LSH_PLANES))}
           AS bucket
  FROM embeddings
),
probe AS (SELECT e AS pe, bucket AS pb FROM sigs WHERE vec_id = 0)
SELECT vec_id, bucket,
       round(list_cosine_similarity(s.e, probe.pe), 4) AS cos_sim
FROM sigs s, probe
WHERE s.bucket = probe.pb AND s.vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 5
"""


@register("q_knn_lsh", oracle=_KNN_LSH_ORACLE)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors of probe vec_id=0.

    One scan computes every vector's 4-bit hyperplane signature; the
    probe's bucket is broadcast and only same-bucket vectors are scored
    exactly. Scale shape: signatures are a map-only pass; the candidate
    join is an equi-join on bucket (each bucket ~1/16 of the corpus
    here, ~1/2^P in general); top-k is TakeOrderedAndProject. Recall is
    tuned with more band tables, not bigger buckets (cf. q_minhash_pairs).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = as_double("embedding")

    def proj(p: int):
        w = F.array(*[F.lit(v) for v in _LSH_SIGNS[p]])
        return F.aggregate(
            F.zip_with(e, w, lambda x, s: x * s), F.lit(0.0), lambda acc, x: acc + x
        )

    bucket = None
    for p in range(_LSH_PLANES):
        bit = F.when(proj(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    sigs = emb.select("vec_id", e.alias("e"), bucket.alias("bucket"))
    probe = sigs.filter(F.col("vec_id") == 0).select(
        F.col("e").alias("pe"), F.col("bucket").alias("pb")
    )
    return (
        sigs.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe), F.col("bucket") == F.col("pb"))
        .select(
            "vec_id",
            "bucket",
            F.round(cosine(F.col("e"), F.col("pe")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# q_knn_pq — product quantization: encode each vector as M=4 sub-space
# codes (K=4 centroids per sub-space), search by asymmetric distance
# (probe-to-centroid lookup tables, no full vectors touched at query
# time). Codebooks are the sub-vectors of 4 fixed seed rows — learning
# them is the orthogonal k-means step already shown by
# q_knn_ivf_kmeans; fixed seeds keep both engines' codes identical by
# construction. At 100 TB the 16-byte-per-vector code table IS the
# searchable index: the scan reads codes, not 256-byte vectors, and
# the ADC sum is 4 table lookups per candidate.
# ---------------------------------------------------------------------------

_PQ_M = 4  # sub-spaces
_PQ_K = 4  # centroids per sub-space
_PQ_D = 16  # dims per sub-space (4 x 16 = 64)
_PQ_SEEDS = (1, 2, 3, 4)  # vec_ids whose sub-vectors form the codebook


def _pq_sub_sql(expr: str, s: int) -> str:
    return f"{expr}[{s * _PQ_D + 1}:{(s + 1) * _PQ_D}]"


def _pq_l2_sql(a: str, b: str) -> str:
    # Same left-to-right f64 fold as Spark's aggregate(zip_with(...)).
    return (
        f"round(list_aggregate(list_transform(range(1, {_PQ_D + 1}), "
        f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])), 'sum'), 6)"
    )


def _pq_code_sql(d: list[str]) -> str:
    # argmin with lowest-k tiebreak, identical CASE chain in both engines.
    return (
        f"CASE WHEN {d[0]} <= {d[1]} AND {d[0]} <= {d[2]} AND {d[0]} <= {d[3]} THEN 0 "
        f"WHEN {d[1]} <= {d[2]} AND {d[1]} <= {d[3]} THEN 1 "
        f"WHEN {d[2]} <= {d[3]} THEN 2 ELSE 3 END"
    )


def _pq_oracle() -> str:
    cent_cols = ", ".join(
        f"(SELECT v FROM e WHERE vec_id = {seed}) AS c{k}"
        for k, seed in enumerate(_PQ_SEEDS)
    )
    code_cols = []
    for s in range(_PQ_M):
        d = [
            _pq_l2_sql(_pq_sub_sql("x.v", s), _pq_sub_sql(f"cents.c{k}", s))
            for k in range(_PQ_K)
        ]
        code_cols.append(f"{_pq_code_sql(d)} AS code{s}")
    t_cols = []
    for s in range(_PQ_M):
        for k in range(_PQ_K):
            t_cols.append(
                f"{_pq_l2_sql(_pq_sub_sql('probe.v', s), _pq_sub_sql(f'cents.c{k}', s))}"
                f" AS t{s}_{k}"
            )
    adc_terms = []
    for s in range(_PQ_M):
        adc_terms.append(
            "CASE codes.code{s} "
            + " ".join(f"WHEN {k} THEN tt.t{{s}}_{k}" for k in range(_PQ_K))
            + " END"
        )
    adc = " + ".join(t.format(s=s) for s, t in enumerate(adc_terms))
    # Shared WITH-body: `scored` = every non-probe vector with its code
    # and (rounded) ADC distance; the two PQ oracles select from it.
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT {cent_cols}),
codes AS (
  SELECT x.vec_id, {", ".join(code_cols)}
  FROM e x CROSS JOIN cents
),
probe AS (SELECT v FROM e WHERE vec_id = 0),
tt AS (SELECT {", ".join(t_cols)} FROM probe CROSS JOIN cents),
scored AS (
  SELECT codes.vec_id,
         codes.code0 * 64 + codes.code1 * 16 + codes.code2 * 4 + codes.code3
           AS pq_code,
         round({adc}, 4) AS adc_dist
  FROM codes CROSS JOIN tt
  WHERE codes.vec_id <> 0
)"""


_KNN_PQ_ORACLE = (
    _pq_oracle()
    + """
SELECT vec_id, pq_code, adc_dist
FROM scored
ORDER BY adc_dist, vec_id
LIMIT 10
"""
)


def _pq_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, pq_code, adc_dist) for every non-probe vector — the PQ
    code table scored against probe 0; shared by the plain PQ search
    and the re-ranked variant."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = as_double("embedding")

    # Codebook: sub-vectors of the 4 seed rows, collected once (a
    # 4x64-float broadcast — the PQ codebook is tiny by design).
    seed_rows = {
        r.vec_id: [float(x) for x in r.v]
        for r in emb.filter(F.col("vec_id").isin(*_PQ_SEEDS))
        .select("vec_id", e.alias("v"))
        .collect()
    }
    cents = [seed_rows[seed] for seed in _PQ_SEEDS]

    def sub(col, s):
        return F.slice(col, s * _PQ_D + 1, _PQ_D)

    def l2(col_sub, lits):
        # aggregate(zip_with(...)) is interpreted per row (HOF lambdas
        # never codegen), but it stays COMPACT: the argmin CASE below
        # references each distance 3-4 times, and an expanded scalar
        # chain (tried round 5) gets duplicated at each reference —
        # thousands of codegen terms, measured 1.8x SLOWER than the
        # interpreted HOF. Compact-interpreted beats exploded-codegen
        # when the consumer multiplies the expression.
        arr = F.array(*[F.lit(v) for v in lits])
        return F.round(
            F.aggregate(
                F.zip_with(col_sub, arr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    def argmin(d):
        return (
            F.when((d[0] <= d[1]) & (d[0] <= d[2]) & (d[0] <= d[3]), 0)
            .when((d[1] <= d[2]) & (d[1] <= d[3]), 1)
            .when(d[2] <= d[3], 2)
            .otherwise(3)
        )

    codes = emb.filter(F.col("vec_id") != 0).select(
        "vec_id",
        *[
            argmin(
                [
                    l2(sub(e, s), cents[k][s * _PQ_D : (s + 1) * _PQ_D])
                    for k in range(_PQ_K)
                ]
            ).alias(f"code{s}")
            for s in range(_PQ_M)
        ],
    )
    probe_t = emb.filter(F.col("vec_id") == 0).select(
        *[
            l2(sub(e, s), cents[k][s * _PQ_D : (s + 1) * _PQ_D]).alias(f"t{s}_{k}")
            for s in range(_PQ_M)
            for k in range(_PQ_K)
        ]
    )
    adc = None
    for s in range(_PQ_M):
        term = (
            F.when(F.col(f"code{s}") == 0, F.col(f"t{s}_0"))
            .when(F.col(f"code{s}") == 1, F.col(f"t{s}_1"))
            .when(F.col(f"code{s}") == 2, F.col(f"t{s}_2"))
            .otherwise(F.col(f"t{s}_3"))
        )
        adc = term if adc is None else adc + term
    return codes.crossJoin(F.broadcast(probe_t)).select(
        "vec_id",
        (
            F.col("code0") * 64
            + F.col("code1") * 16
            + F.col("code2") * 4
            + F.col("code3")
        ).alias("pq_code"),
        F.round(adc, 4).alias("adc_dist"),
    )


@register("q_knn_pq", oracle=_KNN_PQ_ORACLE)
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _pq_scored(spark, sf_dir)
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q_knn_pq_rerank — two-stage retrieval: the ADC code scan shortlists 32
# candidates (reading only 16-byte codes), then ONLY those 32 full
# vectors are fetched for an exact cosine re-rank of the top 5 — the
# standard recall-restoring pattern that keeps full-vector IO
# proportional to the shortlist, not the corpus.
# ---------------------------------------------------------------------------

_PQ_RERANK_ORACLE = (
    _pq_oracle()
    + """,
shortlist AS (
  SELECT vec_id FROM scored ORDER BY adc_dist, vec_id LIMIT 32
)
SELECT s.vec_id,
       round(list_cosine_similarity(e.v, probe.pe), 4) AS cos_sim
FROM shortlist s
JOIN e ON e.vec_id = s.vec_id
CROSS JOIN (SELECT v AS pe FROM e WHERE vec_id = 0) probe
ORDER BY cos_sim DESC, s.vec_id
LIMIT 5
"""
)


@register("q_knn_pq_rerank", oracle=_PQ_RERANK_ORACLE)
def q_knn_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    shortlist = (
        _pq_scored(spark, sf_dir)
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(32)
        .select("vec_id")
    )
    probe = emb.filter(F.col("vec_id") == 0).select(
        as_double("embedding").alias("pe")
    )
    return (
        emb.join(F.broadcast(shortlist), "vec_id", "left_semi")
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(cosine(as_double("embedding"), F.col("pe")), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# q_knn_multiprobe — multi-probe LSH: the recall lever that probes the
# query's home bucket PLUS every Hamming-1 neighbor bucket (flip one
# sign bit), trading a 5× candidate set for recall that would otherwise
# need 5 independent band tables (5× index storage). Same hyperplanes
# as q_knn_lsh.
# ---------------------------------------------------------------------------

_KNN_MULTIPROBE_ORACLE = f"""
WITH sigs AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         {" + ".join(f"(CASE WHEN {_sql_proj(p)} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(_LSH_PLANES))}
           AS bucket
  FROM embeddings
),
probe AS (SELECT e AS pe, bucket AS pb FROM sigs WHERE vec_id = 0),
wanted AS (
  SELECT pb AS b FROM probe
  UNION ALL
  SELECT xor(pb, bit) FROM probe,
         (SELECT unnest([{", ".join(str(1 << p) for p in range(_LSH_PLANES))}]) AS bit)
)
SELECT vec_id, bucket,
       round(list_cosine_similarity(s.e, probe.pe), 4) AS cos_sim
FROM sigs s, probe
WHERE s.bucket IN (SELECT b FROM wanted) AND s.vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""


@register("q_knn_multiprobe", oracle=_KNN_MULTIPROBE_ORACLE)
def q_knn_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-10: candidates from the probe's bucket and
    its 4 Hamming-1 neighbors (~5/16 of the corpus here, ~(P+1)/2^P in
    general). The probe set is a 5-row broadcast joined on bucket —
    still an equi-join, never a scan of the other 11 buckets. Compare
    q_knn_lsh (single bucket): same index, wider probing, higher
    recall, same plan shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = as_double("embedding")

    def proj(p: int):
        w = F.array(*[F.lit(v) for v in _LSH_SIGNS[p]])
        return F.aggregate(
            F.zip_with(e, w, lambda x, s: x * s), F.lit(0.0), lambda acc, x: acc + x
        )

    bucket = None
    for p in range(_LSH_PLANES):
        bit = F.when(proj(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    sigs = emb.select("vec_id", e.alias("e"), bucket.alias("bucket"))
    probe = sigs.filter(F.col("vec_id") == 0).select(
        F.col("e").alias("pe"), F.col("bucket").alias("pb")
    )
    flips = spark.range(_LSH_PLANES + 1).select(
        F.when(F.col("id") == _LSH_PLANES, F.lit(0))
        .otherwise(F.expr("shiftleft(1, cast(id AS int))"))
        .alias("bit")
    )
    wanted = probe.crossJoin(flips).select(
        F.col("pe"), (F.col("pb").bitwiseXOR(F.col("bit"))).alias("bucket")
    )
    return (
        sigs.filter(F.col("vec_id") != 0)
        .join(F.broadcast(wanted), "bucket")
        .select(
            "vec_id",
            "bucket",
            F.round(cosine(F.col("e"), F.col("pe")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q_repetition_score — per-document duplicated-bigram fractions (the
# Gopher/C4-style repetition quality filters).
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
  WHERE len(t) >= 2
),
cnt AS (
  SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY doc_id, bg
)
SELECT
  doc_id,
  CAST(sum(c) AS BIGINT)                       AS n_bigrams,
  count(*)                                     AS n_distinct,
  round(1 - count(*) * 1.0 / sum(c), 4)        AS dup_bigram_frac,
  round(max(c) * 1.0 / sum(c), 4)              AS top_bigram_frac
FROM cnt
GROUP BY doc_id
"""


@register("q_repetition_score", oracle=_REPETITION_ORACLE)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filters: what fraction of a doc's bigrams are repeats,
    and how dominant is its single most frequent bigram. Two shuffles,
    both keyed by doc_id (the second by doc_id alone) — partial
    aggregation keeps the (doc, bigram) shuffle narrow, and nothing is
    corpus-global, so the op is embarrassingly scalable."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        shingle_rows(docs, 2)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(1 - F.count(F.lit(1)) / F.sum("c"), 4).alias("dup_bigram_frac"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# q_contamination_check — test-split docs with a near-duplicate in the
# train split (decontamination: the canonical pre-training hygiene pass).
# ---------------------------------------------------------------------------

# Reuses q_near_dedup's full pair SQL as a subquery, then classifies each
# side with q_train_test_split's hash split and keeps only cross-split
# pairs, oriented test -> train.
_CONTAMINATION_ORACLE = f"""
WITH nd AS ({_NEAR_DEDUP_ORACLE}),
split AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'test' END AS sp
  FROM documents
)
SELECT
  CASE WHEN sa.sp = 'test' THEN nd.doc_a ELSE nd.doc_b END AS test_doc,
  CASE WHEN sa.sp = 'test' THEN nd.doc_b ELSE nd.doc_a END AS train_doc,
  nd.jaccard
FROM nd
JOIN split sa ON sa.doc_id = nd.doc_a
JOIN split sb ON sb.doc_id = nd.doc_b
WHERE sa.sp <> sb.sp
"""


@register("q_contamination_check", oracle=_CONTAMINATION_ORACLE)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split near-duplicate leakage: every (test_doc, train_doc)
    pair whose 3-shingle Jaccard clears the near-dup threshold. Probes
    the session-cached pair index (built once per session/sf by the
    dedup family) and broadcasts the tiny split map — the incremental
    cost over q_near_dedup is two broadcast hash joins over a few
    hundred pair rows."""
    pairs = near_dup_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    split = docs.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
            < "c",
            "train",
        )
        .otherwise("test")
        .alias("sp"),
    )
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("sp").alias("sp_a"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("sp").alias("sp_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.col("sp_a") != F.col("sp_b"))
        .select(
            F.when(F.col("sp_a") == "test", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("test_doc"),
            F.when(F.col("sp_a") == "test", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("train_doc"),
            "jaccard",
        )
    )


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
# q_entropy — per-source token-distribution entropy (corpus diversity).
# ---------------------------------------------------------------------------

# Shannon entropy H = log2(N) - (1/N)·Σ_t c_t·log2(c_t), quantized so
# both engines compute identical integers: each log2 is floored to e6
# fixed-point BEFORE the weighted sum (same discipline as q_lm_score).
# The quantization error is < 2e-6 bits — irrelevant for the diversity
# signal, decisive for cross-engine hash parity.
_ENTROPY_ORACLE = """
WITH terms AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (
  SELECT source, term, count(*) AS c FROM terms WHERE term <> '' GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(sum(c) AS BIGINT)                                   AS n_tokens,
         count(*)                                                 AS n_terms,
         CAST(sum(c * CAST(floor(log2(c) * 1000000) AS BIGINT)) AS BIGINT)
                                                                  AS wlog_e6
  FROM cnt GROUP BY source
)
SELECT source, n_tokens, n_terms,
       round((CAST(floor(log2(n_tokens) * 1000000) AS BIGINT)
              - wlog_e6 // n_tokens) / 1000000.0, 4) AS entropy_bits
FROM agg
"""


@register("q_entropy", oracle=_ENTROPY_ORACLE)
def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution entropy per source — the corpus-diversity
    metric (low entropy = repetitive/templated source, a mix-weighting
    and quality signal). Two shuffles: (source, term) counts with
    map-side partials, then a per-source fold; the per-term weighted
    log2 terms are e6 fixed-point integers so the distributed sum is
    order-independent."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wlog = F.sum(
        F.col("c") * F.floor(F.log2("c") * 1000000).cast("bigint")
    ).cast("bigint")
    agg = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_terms"),
        wlog.alias("wlog_e6"),
    )
    ent = (
        F.floor(F.log2("n_tokens") * 1000000).cast("bigint")
        - F.expr("wlog_e6 div n_tokens")
    ) / 1000000.0
    return agg.select(
        "source", "n_tokens", "n_terms", F.round(ent, 4).alias("entropy_bits")
    )


# ---------------------------------------------------------------------------
# q_near_dedup_survivors — end-to-end near-dup dedup: keep one doc per
# duplicate cluster, report the surviving corpus per source.
# ---------------------------------------------------------------------------

_SURVIVORS_ORACLE = (
    "WITH comp_full AS MATERIALIZED ("
    + _DUP_CLUSTERS_ORACLE
    + """)
SELECT d.source,
       count(*)                                           AS n_docs,
       CAST(sum(CASE WHEN c.rep_id = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       CAST(sum(CASE WHEN c.rep_id = d.doc_id
                     THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT)
         AS surviving_tokens
FROM documents d
JOIN comp_full c ON c.doc_id = d.doc_id
GROUP BY d.source
"""
)


@register("q_near_dedup_survivors", oracle=_SURVIVORS_ORACLE)
def q_near_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's dedup OUTPUT stage: detect near-dups (shingle
    index), cluster them (connected components), keep the min-id doc of
    each cluster, and report per-source doc/survivor/token counts — what
    a training-data build actually materializes. Reuses the cached pair
    index and converged labels; the incremental cost is one broadcast
    join of the label table against the corpus scan."""
    from data_ingestion_service_spark.registry import QUERIES

    comp = QUERIES["q_dup_clusters"](spark, sf_dir).select("doc_id", "rep_id")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens("text")).alias("n_tok")
    )
    survived = F.when(F.col("rep_id") == F.col("doc_id"), 1).otherwise(0)
    return (
        docs.join(comp, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(survived).alias("n_survivors"),
            F.sum(
                F.when(F.col("rep_id") == F.col("doc_id"), F.col("n_tok")).otherwise(0)
            )
            .cast("bigint")
            .alias("surviving_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q_minhash_estimate — Jaccard ESTIMATION from MinHash signatures: for
# every LSH candidate pair, the fraction of agreeing signature
# components is an unbiased estimate of the true Jaccard — the second
# half of what signatures buy (banding finds the pairs, agreement
# scores them WITHOUT touching shingles again). At 100 TB this replaces
# the exact-verify join for use cases that tolerate ±1/16 resolution.
# ---------------------------------------------------------------------------

_MINHASH_EST_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM toks
    WHERE len(t) >= 3
  )
),
hashes AS (
  SELECT doc_id, ii.i, min(md5(ii.i::VARCHAR || '|' || shingle)) AS mh
  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS i) ii
  GROUP BY doc_id, ii.i
),
bands AS (
  SELECT doc_id, i // 2 AS band, md5(string_agg(mh, '' ORDER BY i)) AS band_hash
  FROM hashes
  GROUP BY doc_id, i // 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(count(CASE WHEN ha.mh = hb.mh THEN 1 END) / 16.0, 4)
         AS est_jaccard
FROM cand c
JOIN hashes ha ON ha.doc_id = c.doc_a
JOIN hashes hb ON hb.doc_id = c.doc_b AND hb.i = ha.i
GROUP BY c.doc_a, c.doc_b
"""


@register("q_minhash_estimate", oracle=_MINHASH_EST_ORACLE)
def q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.operators.llm_extended import (
        minhash_signatures,
    )
    from data_ingestion_service_spark.registry import QUERIES

    # Shared session-persisted signature store (r5 verdict item 4) — the
    # same 16-minhash table q_minhash_pairs' band index derives from.
    sigs = minhash_signatures(spark, sf_dir)
    cand = QUERIES["q_minhash_pairs"](spark, sf_dir).select("doc_a", "doc_b")
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)],
    )
    matches = None
    for i in range(16):
        m = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        matches = m if matches is None else matches + m
    # Broadcast the CANDIDATE PAIRS (hundreds of rows), never the
    # signature table (grows with the corpus): each join streams sigs
    # against the broadcast pair list, and the enriched intermediate
    # stays |cand|-sized for the second hop.
    with_a = a.join(F.broadcast(cand), "doc_a")
    return b.join(F.broadcast(with_a), "doc_b").select(
        "doc_a", "doc_b", F.round(matches / 16.0, 4).alias("est_jaccard")
    )


# ---------------------------------------------------------------------------
# q_containment_pairs — asymmetric near-dup detection: shingle
# CONTAINMENT C(A in B) = |A∩B| / |A| catches a short document embedded
# verbatim in a longer one — a case symmetric Jaccard structurally
# under-scores (the union is dominated by the long side). Same inverted
# -index candidate generation as q_near_dedup (only docs sharing a
# shingle ever pair), different final score; emitted per direction.
# ---------------------------------------------------------------------------

_CONTAINMENT_THRESHOLD = 0.6

_CONTAINMENT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM toks
    WHERE len(t) >= 3
  )
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  -- mirror the Spark side's hot-shingle posting-list cap so the two
  -- definitions stay identical at ANY scale (ADVICE r6)
  WHERE a.shingle IN (SELECT shingle FROM sh
                      GROUP BY shingle
                      HAVING count(DISTINCT doc_id) <= {_HOT_SHINGLE_CAP})
  GROUP BY 1, 2
),
directed AS (
  SELECT doc_a AS inner_doc, doc_b AS outer_doc, n_common,
         n_common * 1.0 / sa.sz AS containment
  FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
  UNION ALL
  SELECT doc_b, doc_a, n_common, n_common * 1.0 / sb.sz
  FROM pairs JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT inner_doc, outer_doc, round(containment, 4) AS containment
FROM directed
WHERE containment >= {_CONTAINMENT_THRESHOLD}
"""


@register("q_containment_pairs", oracle=_CONTAINMENT_ORACLE)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.countDistinct("shingle").alias("sz"))
    grouped = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter((F.size("ds") <= _HOT_SHINGLE_CAP) & (F.size("ds") >= 2))
    )
    e1 = grouped.select("ds", F.posexplode("ds").alias("i", "doc_a"))
    pairs = (
        e1.select(
            "doc_a",
            F.explode(F.slice("ds", F.col("i") + 2, F.size("ds"))).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    both = pairs.join(F.broadcast(sa), "doc_a").join(F.broadcast(sb), "doc_b")
    directed = both.select(
        F.col("doc_a").alias("inner_doc"),
        F.col("doc_b").alias("outer_doc"),
        (F.col("n_common") / F.col("sz_a")).alias("containment"),
    ).unionAll(
        both.select(
            F.col("doc_b"),
            F.col("doc_a"),
            (F.col("n_common") / F.col("sz_b")),
        )
    )
    return directed.filter(
        F.col("containment") >= _CONTAINMENT_THRESHOLD
    ).select("inner_doc", "outer_doc", F.round("containment", 4).alias("containment"))


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


def _degree_directed_edges(e: DataFrame) -> DataFrame:
    """Orient each undirected edge from lower to higher (degree, id).

    The node-iterator refinement that survives hubs at 100 TB: a vertex
    of degree d only keeps out-edges to HIGHER-(degree,id) neighbors, so
    a hub's out-degree collapses and the wedge count is O(m^1.5)
    (Schank/Wagner ordered triangle listing) instead of O(sum deg²) —
    id-ordering leaves a low-id hub as wedge center with all d² pairs.
    Columns: src, dst, plus dst's order key (dd, dst) for wedge-side
    lexicographic comparison without a global rank (a global rank would
    need a corpus-wide window — one task)."""
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
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
    e = near_dup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    d = _degree_directed_edges(e)
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
    verts = e.select(F.col("a").alias("v")).unionAll(e.select(F.col("b")))
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_verts = verts.agg(F.countDistinct("v").alias("n_vertices"))
    return (
        tri.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(n_verts))
        .select("n_triangles", "n_edges", "n_vertices")
    )


# ---------------------------------------------------------------------------
# q_lm_score — bigram language-model quality scoring.
# ---------------------------------------------------------------------------

_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
  WHERE len(t) >= 2
),
bi2 AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bi),
c2 AS (SELECT bg, count(*) AS c2 FROM bi2 GROUP BY bg),
c1 AS (SELECT w1, count(*) AS c1 FROM bi2 GROUP BY w1),
scored AS (
  SELECT b.doc_id,
         CAST(floor(log2(c2.c2 * 1.0 / c1.c1) * 1000000) AS BIGINT) AS lp_e6
  FROM bi2 b JOIN c2 ON c2.bg = b.bg JOIN c1 ON c1.w1 = b.w1
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(sum(lp_e6) * 1.0 / count(*) / 1000000, 4) AS avg_log2_prob
FROM scored
GROUP BY doc_id
"""


@register("q_lm_score", oracle=_LM_ORACLE)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM scoring — the language-model quality
    filter: train bigram conditionals P(w2|w1) = c(w1 w2)/c(w1·) on the
    corpus itself, then score each doc by its mean log2 bigram
    probability (low = improbable word sequences). Per-bigram log-probs
    are floored to e6 fixed-point BEFORE summing, so the per-doc sum is
    an integer sum — associative, immune to distributed accumulation
    order (the float-sum hazard every distributed scoring pipeline
    hits). Three shuffles: bigram counts, prefix counts, per-doc sum;
    the model join is keyed by bigram — at 100 TB the model would be a
    broadcast-able pruned table (min-count cutoff), same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    bi = shingle_rows(docs, 2).select(
        "doc_id",
        F.col("shingle").alias("bg"),
        F.substring_index("shingle", " ", 1).alias("w1"),
    )
    c2 = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bi.join(c2, "bg")
        .join(c1, "w1")
        .select(
            "doc_id",
            F.floor(F.log2(F.col("c2") * 1.0 / F.col("c1")) * 1000000)
            .cast("bigint")
            .alias("lp_e6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.sum("lp_e6") * 1.0 / F.count(F.lit(1)) / 1000000, 4).alias(
            "avg_log2_prob"
        ),
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
        pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
        edges = pairs.union(
            pairs.select(F.col("doc_b"), F.col("doc_a"))
        ).toDF("s", "d").persist()
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
        # Materialize the converged ranks, then free the edge/deg caches —
        # iterations are done; only the result outlives the build.
        ranks = ranks.localCheckpoint()
        edges.unpersist()
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
# q_rolling_hash — Karp-Rabin window fingerprints (winnowing summary).
# ---------------------------------------------------------------------------

_RH_K = 4  # tokens per window
_RH_M = 1 << 20  # token-hash modulus (keeps the polynomial in 48 bits)
_RH_P = 1 << 40  # window-hash modulus
_RH_B = 131  # polynomial base


def window_hash_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, wh) — one row per 4-token Karp-Rabin window.

    The shared fingerprint construction behind q_rolling_hash (per-doc
    winnowing summary) and q_substring_dup (cross-doc fingerprint join):
    token hashes from md5 mod 2^20, polynomial fold base 131 mod 2^40,
    so the arithmetic never leaves 48 bits. The per-token hash array is
    computed ONCE per doc (one interpreted HOF pass); window expansion
    is explode(sequence)+getItem arithmetic that stays in whole-stage
    codegen. Map-only — callers choose the shuffle key. Also carries the
    0-based window position ``i`` (q_winnowing_select needs it; position
    -agnostic consumers drop it before any distinct).
    """
    toked = docs.select("doc_id", tokens("text").alias("t")).filter(
        F.size("t") >= _RH_K
    )
    ha = F.transform(
        F.col("t"),
        lambda tok: F.conv(F.substring(F.md5(tok.cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        % _RH_M,
    )
    hashed = toked.select("doc_id", ha.alias("ha"))
    exploded = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("ha") - _RH_K)).alias("i"),
        "ha",
    )
    wh = F.col("ha")[F.col("i")]
    for j in range(1, _RH_K):
        wh = (wh * _RH_B + F.col("ha")[F.col("i") + j]) % _RH_P
    return exploded.select("doc_id", "i", wh.alias("wh"))

_ROLLING_HASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
h AS (
  SELECT doc_id,
         list_transform(t, tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT
                                  % {_RH_M}) AS ha,
         len(t) AS n
  FROM toks
  WHERE len(t) >= {_RH_K}
),
w AS (
  SELECT doc_id,
         unnest(list_transform(range(1, n - {_RH_K - 2}),
           i -> ((((ha[i] * {_RH_B} + ha[i+1]) % {_RH_P}) * {_RH_B} + ha[i+2])
                 % {_RH_P} * {_RH_B} + ha[i+3]) % {_RH_P})) AS wh
  FROM h
)
SELECT doc_id,
       count(*)            AS n_windows,
       min(wh)             AS fp_min,
       count(DISTINCT wh)  AS fp_distinct
FROM w
GROUP BY doc_id
"""


@register("q_rolling_hash", oracle=_ROLLING_HASH_ORACLE)
def q_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp-Rabin fingerprinting: polynomial hash of every 4-token
    window (mod 2^40, base 131, token hashes from md5 mod 2^20 so the
    fold never leaves 48 bits), summarized winnowing-style as the
    window count, the minimum window hash, and the distinct-hash count.
    The per-token hash array is computed ONCE per doc (one interpreted
    HOF pass); window expansion is explode(sequence)+getItem arithmetic
    that stays in whole-stage codegen, and the only shuffle is the
    final doc_id aggregation — identical topology to shingle_rows. An
    imperative engine would slide the window incrementally; the
    declarative form computes each window independently, same values."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        window_hash_rows(docs)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.min("wh").alias("fp_min"),
            F.countDistinct("wh").alias("fp_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# q_substring_dup — cross-document EXACT-SUBSTRING duplication (the Lee
# et al. "Deduplicating Training Data Makes Language Models Better"
# tier): document pairs sharing >= 3 distinct 4-token Karp-Rabin window
# fingerprints, i.e. pairs containing verbatim copied spans. This is the
# dedup waterfall's missing rung between q_dedup_docs (whole-text exact)
# and q_near_dedup (shingle Jaccard): it catches a paragraph pasted into
# an otherwise-different page, which whole-text hashing misses and
# symmetric Jaccard under-scores. Scale shape: the fingerprint table
# shuffles keyed by window hash (never text), posting lists are capped
# at _HOT_SHINGLE_CAP docs (boilerplate windows — cap applied in BOTH
# engines so the key stays exact if it fires), pair expansion is
# bounded by cap^2 per window, and the result-sized pair list is
# broadcast through the size joins. Nothing is all-pairs.
# ---------------------------------------------------------------------------

_SUBDUP_MIN_SHARED = 3  # distinct shared windows to call it a dup pair

# Shared CTE fragments (no leading WITH): the window-fingerprint base and
# the qualifying-pair derivation, spliced into this key's oracle AND the
# waterfall's so both engines and both keys share one pair definition.
_WINDOW_HASH_CTE = f"""
toks_rh AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
h_rh AS (
  SELECT doc_id,
         list_transform(t, tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT
                                  % {_RH_M}) AS ha,
         len(t) AS n
  FROM toks_rh WHERE len(t) >= {_RH_K}
),
w_rh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, n - {_RH_K - 2}),
           i -> ((((ha[i] * {_RH_B} + ha[i+1]) % {_RH_P}) * {_RH_B} + ha[i+2])
                 % {_RH_P} * {_RH_B} + ha[i+3]) % {_RH_P})) AS wh
  FROM h_rh
),
dw_rh AS (SELECT DISTINCT doc_id, wh FROM w_rh)
"""

_SUBDUP_PAIRS_CTE = f"""
ok_rh AS (
  SELECT wh FROM dw_rh
  GROUP BY wh HAVING count(*) BETWEEN 2 AND {_HOT_SHINGLE_CAP}
),
dwf_rh AS (SELECT dw_rh.* FROM dw_rh JOIN ok_rh USING (wh)),
sub_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM dwf_rh a JOIN dwf_rh b ON a.wh = b.wh AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {_SUBDUP_MIN_SHARED}
)
"""

_SUBDUP_ORACLE = f"""
WITH {_WINDOW_HASH_CTE.strip()},
{_SUBDUP_PAIRS_CTE.strip()},
sz_rh AS (SELECT doc_id, count(*) AS nw FROM dw_rh GROUP BY doc_id)
SELECT doc_a, doc_b, n_shared,
       CAST(n_shared * 1000000 // (sa.nw + sb.nw - n_shared) AS BIGINT)
         AS overlap_e6
FROM sub_pairs
JOIN sz_rh sa ON sa.doc_id = doc_a
JOIN sz_rh sb ON sb.doc_id = doc_b
"""


def substring_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, n_shared) — qualifying substring-dup pairs.

    Session-persisted per (sf_dir): q_substring_dup and the waterfall's
    substring rung both probe the same materialized pair list instead of
    re-running the fingerprint shuffle.
    """

    def _build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        dw = window_hash_rows(docs).select("doc_id", "wh").distinct()
        grouped = (
            dw.groupBy("wh")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
            .filter((F.size("ds") >= 2) & (F.size("ds") <= _HOT_SHINGLE_CAP))
        )
        e1 = grouped.select("ds", F.posexplode("ds").alias("i", "doc_a"))
        return (
            e1.select(
                "doc_a",
                F.explode(F.slice("ds", F.col("i") + 2, F.size("ds"))).alias(
                    "doc_b"
                ),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= _SUBDUP_MIN_SHARED)
        )

    return session_persisted(spark, ("substring_dup_pairs", sf_dir), _build)


@register("q_substring_dup", oracle=_SUBDUP_ORACLE)
def q_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = substring_dup_pairs(spark, sf_dir)
    sizes = (
        window_hash_rows(docs)
        .select("doc_id", "wh")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nw").alias("nw_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nw").alias("nw_b"))
    # Broadcast the result-sized PAIR list, never the corpus-sized
    # fingerprint-count table (q_minhash_estimate's join shape).
    with_a = sa.join(F.broadcast(pairs), "doc_a")
    return sb.join(F.broadcast(with_a), "doc_b").select(
        "doc_a",
        "doc_b",
        "n_shared",
        F.expr("n_shared * 1000000 div (nw_a + nw_b - n_shared)").alias(
            "overlap_e6"
        ),
    )


# ---------------------------------------------------------------------------
# q_dup_clusters_pj — connected components by pointer jumping.
# ---------------------------------------------------------------------------


def pointer_jump_components(
    pairs: DataFrame, max_iter: int = 20
) -> tuple[DataFrame, int]:
    """Min-label connected components with pointer jumping.

    Each round does (1) a neighbor-min step (one shuffle keyed by dst —
    self-loops fold "keep own label" into the same aggregation, as in
    q_dup_clusters) and then (2) a pointer-jump step label(v) <-
    label(label(v)) (one self-join shuffle). Jumping halves every
    label-chain's depth, so a diameter-d component converges in O(log d)
    rounds instead of O(d) — on a 100 TB corpus where one viral document
    chains thousands of near-dups together, that is the difference
    between ~12 and ~1000s of shuffles. Returns (labels, rounds_used);
    labels = (doc_id, label) for every doc touched by a pair.
    """
    touched = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    edges = (
        pairs.select("doc_a", "doc_b")
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .toDF("src", "dst")
        .union(
            touched.select(F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
        )
        .persist()
    )
    labels = touched.select("doc_id", F.col("doc_id").alias("label")).persist()
    prev_sum = None
    rounds = 0
    for it in range(max_iter):
        rounds = it + 1
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("label"))
        )
        # Pointer jump THROUGH THE PREVIOUS round's labels (already
        # persisted, so the lookup side is a cache hit instead of a
        # same-round self-join that would recompute the aggregation
        # twice per action). prev[x] <= x for every touched x (labels
        # start at the id and only decrease), so the jump is still
        # monotone; on a chain it still compounds the lookback
        # exponentially (pinned by the 32-chain convergence test). A
        # label always IS some touched doc's id, so the left join only
        # misses for rows already at a root — coalesce covers it.
        lut = labels.select(
            F.col("doc_id").alias("lbl_id"), F.col("label").alias("lbl_label")
        )
        new_labels = (
            nbr_min.join(lut, nbr_min.label == lut.lbl_id, "left")
            .select(
                "doc_id", F.coalesce("lbl_label", "label").alias("label")
            )
        )
        # Same lineage-control tradeoff as q_dup_clusters: eager local
        # checkpoint every 3rd round keeps plan depth O(1); swap for
        # reliable checkpoint() on a real cluster (executor-loss safety).
        if (it + 1) % 3 == 0:
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist()
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels, rounds


@register("q_dup_clusters_pj", oracle=_DUP_CLUSTERS_ORACLE)
def q_dup_clusters_pj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result (and same recursive-CTE oracle) as q_dup_clusters,
    computed with pointer jumping — the variant to reach for when
    duplicate clusters are long chains rather than dense blobs."""
    labels = session_persisted(
        spark,
        ("dup_cluster_labels_pj", sf_dir),
        lambda: pointer_jump_components(near_dup_pairs(spark, sf_dir))[0],
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    comp = docs.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("rep_id")
    )
    sizes = comp.groupBy("rep_id").agg(F.count(F.lit(1)).alias("n_members"))
    return comp.join(F.broadcast(sizes), "rep_id").select(
        "doc_id", "rep_id", "n_members"
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
# q_pii_redact — PII scrubbing, the compliance gate every training-data
# pipeline runs before text leaves the ingestion boundary: regex-detect
# emails and phone numbers, replace with typed placeholder tags, report
# per-source hit counts and an order-independent checksum of the
# REDACTED text (so the scrub's exact output — not just its counts — is
# hash-verified). The fixture corpus is synthetic word soup with no
# organic PII, so both engines deterministically append the same
# synthetic contact line per doc before scrubbing — the construction is
# part of the shared query, keeping detection+redaction real while the
# fixture stays clean. Patterns use only portable regex (char classes,
# +, {n}) — identical semantics in Java regex and DuckDB's RE2. Scale
# shape: map-only scan -> per-source agg, one shuffle of 5 rows.
# ---------------------------------------------------------------------------

_PII_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
_PII_PHONE_RE = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"

_PII_ORACLE = f"""
WITH synth AS (
  SELECT source,
         text || ' reach user' || CAST(doc_id AS VARCHAR) ||
         '@example.com or +1-555-' ||
         substr(CAST(10000 + doc_id % 10000 AS VARCHAR), 2, 4) AS raw
  FROM documents
),
red AS (
  SELECT source,
         regexp_matches(raw, '{_PII_EMAIL_RE}') AS has_email,
         regexp_matches(raw, '{_PII_PHONE_RE}') AS has_phone,
         regexp_replace(
           regexp_replace(raw, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_PII_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM synth
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN has_email THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_email,
       CAST(sum(CASE WHEN has_phone THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_phone,
       CAST(sum(CASE WHEN clean LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_residual_at,
       CAST(sum(('0x' || substr(md5(clean), 1, 15))::BIGINT % 1000000000)
         AS BIGINT) AS clean_checksum
FROM red
GROUP BY source
"""


@register("q_pii_redact", oracle=_PII_ORACLE)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.substring((F.lit(10000) + F.col("doc_id") % 10000).cast("string"), 2, 4),
    )
    clean = F.regexp_replace(
        F.regexp_replace(raw, _PII_EMAIL_RE, "<EMAIL>"),
        _PII_PHONE_RE,
        "<PHONE>",
    )
    red = docs.select(
        "source",
        raw.rlike(_PII_EMAIL_RE).alias("has_email"),
        raw.rlike(_PII_PHONE_RE).alias("has_phone"),
        clean.alias("clean"),
    )
    checksum = (
        F.conv(F.substring(F.md5(F.col("clean").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        % 1000000000
    )
    return red.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("has_email").cast("long")).cast("long").alias("n_with_email"),
        F.sum(F.col("has_phone").cast("long")).cast("long").alias("n_with_phone"),
        F.sum(F.col("clean").contains("@").cast("long"))
        .cast("long")
        .alias("n_residual_at"),
        F.sum(checksum).cast("long").alias("clean_checksum"),
    )


# ---------------------------------------------------------------------------
# q_text_normalize — Unicode canonicalization, the FIRST step of every
# text-cleaning pipeline: NFC-compose combining marks, casefold, and
# collapse runs of spaces, so "Cafe" + U+0301 and "Café" dedup/tokenize
# identically downstream. Spark has no built-in Unicode normalizer, so
# this is a deliberate Arrow-batched pandas_udf (unicodedata.normalize —
# the canonical use of the Python escape hatch: per-row pure function,
# vectorized batch transfer, no state); the oracle runs DuckDB's native
# nfc_normalize — cross-engine agreement holds because NFC is defined by
# the Unicode standard, not the engine. Every doc gets the same
# synthetic decomposed prefix on BOTH sides (the fixture corpus is
# plain-ASCII word soup, so the construction makes the normalization
# observable — pre/post lengths MUST differ). Output hash-checks the
# normalized text itself per source, not just counts.
# ---------------------------------------------------------------------------

_TEXT_NORM_ORACLE = """
WITH synth AS (
  SELECT source,
         'Cafe' || chr(769) || '  NAI' || chr(776) || 'VE  ' || text AS raw
  FROM documents
),
norm AS (
  SELECT source,
         length(raw) AS pre_len,
         regexp_replace(lower(nfc_normalize(raw)), ' +', ' ', 'g') AS clean
  FROM synth
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(pre_len) AS BIGINT)       AS pre_chars,
       CAST(sum(length(clean)) AS BIGINT) AS post_chars,
       CAST(sum(('0x' || substr(md5(clean), 1, 15))::BIGINT % 1000000000)
         AS BIGINT) AS norm_checksum
FROM norm
GROUP BY source
"""


@register("q_text_normalize", oracle=_TEXT_NORM_ORACLE)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas
    from pyspark.sql.functions import pandas_udf

    def _nfc_lower_collapse(s: "pandas.Series") -> "pandas.Series":
        import re
        import unicodedata

        return s.map(
            lambda t: re.sub(" +", " ", unicodedata.normalize("NFC", t).lower())
        )

    # Under `from __future__ import annotations` the decorator resolves
    # the string hints against the function's globals — "pandas.Series"
    # must name a module visible there (a function-local `pd` alias is
    # not: PySpark raises UNSUPPORTED_SIGNATURE).
    _nfc_lower_collapse.__globals__.setdefault("pandas", pandas)
    nfc_lower_collapse = pandas_udf("string")(_nfc_lower_collapse)

    docs = load_table(spark, sf_dir, "documents")
    # Explicit combining-mark escapes (U+0301, U+0308), never raw
    # decomposed characters: an editor/formatter that NFC-normalizes this
    # source file must not silently change pre_chars semantics (r5 advisor
    # finding). Mirrors the oracle's chr(769)/chr(776) construction.
    raw = F.concat(
        F.lit("Cafe\u0301  NAI\u0308VE  "), F.col("text")
    )
    norm = docs.select(
        "source",
        F.length(raw).alias("pre_len"),
        nfc_lower_collapse(raw).alias("clean"),
    )
    checksum = (
        F.conv(F.substring(F.md5(F.col("clean").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        % 1000000000
    )
    return norm.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pre_len").cast("long").alias("pre_chars"),
        F.sum(F.length("clean")).cast("long").alias("post_chars"),
        F.sum(checksum).cast("long").alias("norm_checksum"),
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
# q_ngram_decontaminate — n-gram-level test-set decontamination (the
# GPT-3-style "13-gram filter", here 8-grams): a TRAIN document is
# contaminated if it shares ANY token 8-gram with any TEST document —
# finer than q_contamination_check's whole-doc near-dup criterion,
# because a single quoted benchmark answer inside an otherwise-unique
# crawl page is exactly what this catches. Split is the q_train_test_
# split hash (~75/25), shingles come from the shared codegen explode
# idiom, and the join is an inverted-index semi/inner join keyed on the
# 8-gram — train-side grams are DISTINCT-ed per doc first, so a gram
# repeated inside one doc cannot amplify the join, and the test-side
# gram set is corpus-wide distinct (the benchmark suite is always the
# small side at 100 TB — broadcastable; here Spark picks it
# automatically). Reported per source: train docs, contaminated docs,
# and total distinct (doc, gram) overlap instances.
# ---------------------------------------------------------------------------

_NGRAM_DECON_K = 8

_NGRAM_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train,
         string_split(text, ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source, is_train,
         unnest(list_transform(range(1, len(t) - {_NGRAM_DECON_K} + 2),
                i -> list_aggregate(t[i : i + {_NGRAM_DECON_K} - 1], 'string_agg', ' ')))
           AS g
  FROM toks
  WHERE len(t) >= {_NGRAM_DECON_K}
),
test_grams AS (SELECT DISTINCT g FROM grams WHERE NOT is_train),
train_grams AS (
  SELECT DISTINCT doc_id, source, g FROM grams WHERE is_train
),
hits AS (
  SELECT tg.doc_id, tg.source, count(*) AS n_hits
  FROM train_grams tg JOIN test_grams te ON te.g = tg.g
  GROUP BY tg.doc_id, tg.source
),
train_docs AS (
  SELECT source, count(DISTINCT doc_id) AS n_train
  FROM toks WHERE is_train GROUP BY source
)
SELECT d.source,
       d.n_train,
       CAST(coalesce(count(h.doc_id), 0) AS BIGINT)   AS n_contaminated,
       CAST(coalesce(sum(h.n_hits), 0) AS BIGINT)     AS overlap_instances
FROM train_docs d LEFT JOIN hits h ON h.source = d.source
GROUP BY d.source, d.n_train
"""


@register("q_ngram_decontaminate", oracle=_NGRAM_DECON_ORACLE)
def q_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_train = (
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
        < "c"
    )
    tagged = docs.select("doc_id", "source", is_train.alias("is_train"))
    grams = shingle_rows(docs, _NGRAM_DECON_K).join(tagged, "doc_id")
    test_grams = (
        grams.filter(~F.col("is_train")).select(F.col("shingle").alias("g")).distinct()
    )
    train_grams = (
        grams.filter(F.col("is_train"))
        .select("doc_id", "source", F.col("shingle").alias("g"))
        .distinct()
    )
    hits = (
        train_grams.join(test_grams, "g")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    train_docs = (
        tagged.filter("is_train")
        .groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n_train"))
    )
    return (
        train_docs.join(hits, "source", "left")
        .groupBy("source", "n_train")
        .agg(
            F.count("doc_id").cast("long").alias("n_contaminated"),
            F.coalesce(F.sum("n_hits"), F.lit(0))
            .cast("long")
            .alias("overlap_instances"),
        )
    )


# ---------------------------------------------------------------------------
# q_dup_paragraph_fraction — CROSS-document duplicate-paragraph
# fraction (the CCNet/Gopher corpus-quality signal; q_repetition_score
# is the WITHIN-doc complement): docs are segmented into fixed 10-token
# blocks ("paragraphs" — the fixture has no newlines, so segmentation
# is positional and identical in both engines), each block is hashed,
# and a block is duplicated if the SAME block text appears in any other
# document. Per doc: block count and duplicated-block fraction; per
# source: mean fraction and the share of docs with >=50% duplicated
# blocks (the usual drop threshold). Scale shape: block hashing is
# map-side; the only shuffle is the block-hash groupBy whose fan-in is
# bounded the same way the shingle index is (a viral block counts once
# per doc via per-doc distinct).
# ---------------------------------------------------------------------------

_PARA_K = 10

_DUP_PARA_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
blocks AS (
  SELECT doc_id, source,
         unnest(list_transform(range(0, CAST(floor(len(t) / {_PARA_K}) AS BIGINT)),
                i -> list_aggregate(t[i * {_PARA_K} + 1 : (i + 1) * {_PARA_K}],
                                    'string_agg', ' '))) AS block
  FROM toks
  WHERE len(t) >= {_PARA_K}
),
per_block AS (
  SELECT DISTINCT doc_id, source, block FROM blocks
),
block_docs AS (
  SELECT block, count(*) AS n_docs_with FROM per_block GROUP BY block
),
per_doc AS (
  SELECT p.doc_id, p.source,
         count(*) AS n_blocks,
         sum(CASE WHEN bd.n_docs_with > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM per_block p JOIN block_docs bd ON bd.block = p.block
  GROUP BY p.doc_id, p.source
)
SELECT source,
       count(*) AS n_docs,
       -- integer-only mean: per-doc e6 fraction floored FIRST, then an
       -- integer-sum mean — no float accumulation order anywhere
       CAST(sum(n_dup * 1000000 // n_blocks) // count(*) AS BIGINT)
         AS mean_dup_frac_e6,
       CAST(sum(CASE WHEN n_dup * 2 >= n_blocks THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_half_dup
FROM per_doc
GROUP BY source
"""


@register("q_dup_paragraph_fraction", oracle=_DUP_PARA_ORACLE)
def q_dup_paragraph_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "source", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= _PARA_K)
    exploded = toked.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(0), F.floor(F.size("t") / _PARA_K).cast("long") - 1)
        ).alias("i"),
        "t",
    )
    block = F.concat_ws(
        " ",
        *[
            F.col("t")[(F.col("i") * _PARA_K + j).cast("int")]
            for j in range(_PARA_K)
        ],
    )
    per_block = (
        exploded.select("doc_id", "source", block.alias("block"))
        .repartition("block")
        .dropDuplicates(["doc_id", "source", "block"])
    )
    block_docs = per_block.groupBy("block").agg(
        F.count(F.lit(1)).alias("n_docs_with")
    )
    per_doc = (
        per_block.join(block_docs, "block")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((F.col("n_docs_with") > 1).cast("long")).alias("n_dup"),
        )
    )
    # Per-doc e6 fraction floored FIRST (integer div), then an integer
    # mean — distributed accumulation order cannot flip the result.
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("sum(n_dup * 1000000 div n_blocks) div count(*)")
        .cast("long")
        .alias("mean_dup_frac_e6"),
        F.sum((F.col("n_dup") * 2 >= F.col("n_blocks")).cast("long"))
        .cast("long")
        .alias("n_docs_half_dup"),
    )


# ---------------------------------------------------------------------------
# q_k_anonymity — re-identification risk audit, the privacy-compliance
# gate on any released dataset: group records by their quasi-identifier
# tuple (here nation × market segment) and flag equivalence classes
# smaller than k=5 — rows in such classes are re-identifiable by
# joining public attributes. Reports, per nation: class counts, the
# k-violating classes, the rows that would need suppression or
# generalization, and the minimum class size (the dataset's actual k).
# One shuffle on the quasi-identifier tuple, one tiny rollup — the
# audit costs a GROUP BY at any scale.
# ---------------------------------------------------------------------------

_K_ANON_K = 5

_K_ANON_ORACLE = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS class_size
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey,
       count(*) AS n_classes,
       CAST(sum(CASE WHEN class_size < {_K_ANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_classes,
       CAST(sum(CASE WHEN class_size < {_K_ANON_K} THEN class_size ELSE 0 END)
         AS BIGINT) AS n_rows_at_risk,
       CAST(min(class_size) AS BIGINT) AS min_class_size
FROM classes
GROUP BY c_nationkey
"""


@register("q_k_anonymity", oracle=_K_ANON_ORACLE)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    small = F.col("class_size") < _K_ANON_K
    return classes.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(small.cast("long")).cast("long").alias("n_violating_classes"),
        F.sum(F.when(small, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.min("class_size").cast("long").alias("min_class_size"),
    )


# ---------------------------------------------------------------------------
# q_source_divergence — per-source token-distribution drift vs the rest
# of the corpus: the common-vocabulary KL contribution
# Σ_t c_t · log2((c_t · M) / (d_t · N)) in e6 fixed-point, where
# (c_t, N) are the source's term count/total and (d_t, M) the
# complement's — the mixing diagnostic that tells you WHICH source's
# language diverges from the blend (q_entropy says how diverse each is;
# this says how far apart they are). Restricting to the shared vocab
# keeps the quantity smoothing-free and well-defined; vocabulary
# coverage is reported alongside so a low-overlap source can't hide.
# Per-term log ratios are floored to e6 BEFORE the weighted integer sum
# (the q_lm_score/q_entropy idiom) so distributed accumulation order
# cannot flip parity. Two shuffles: term counts by (source, term), then
# the per-source rollup.
# ---------------------------------------------------------------------------

_SOURCE_DIVERGENCE_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
),
per_source AS (
  SELECT source, t, count(*) AS c FROM tok GROUP BY source, t
),
totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM per_source GROUP BY source
),
global_t AS (
  SELECT t, CAST(sum(c) AS BIGINT) AS g FROM per_source GROUP BY t
),
grand AS (SELECT CAST(sum(c) AS BIGINT) AS gt FROM per_source),
terms AS (
  SELECT p.source, p.t, p.c,
         (g.g - p.c)  AS d,
         tt.n         AS n,
         (gr.gt - tt.n) AS m
  FROM per_source p
  JOIN global_t g ON g.t = p.t
  JOIN totals tt ON tt.source = p.source
  CROSS JOIN grand gr
  WHERE g.g - p.c > 0
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_tokens,
       count(*) AS n_common_terms,
       -- log-SPACE ratio (log2 c + log2 m - log2 d - log2 n), never the
       -- BIGINT products c*m / d*n: at 100 TB those exceed 2^63, where
       -- Spark (ANSI off) wraps silently while DuckDB errors (r5 advisor
       -- finding). Each log2 input is an exact integer-valued double and
       -- the 4-term fold order is pinned left-to-right on both engines.
       CAST(sum(c * CAST(floor((log2(c) + log2(m) - log2(d) - log2(n))
                               * 1000000) AS BIGINT)) AS BIGINT)
         AS kl_weighted_e6
FROM terms
GROUP BY source
"""


@register("q_source_divergence", oracle=_SOURCE_DIVERGENCE_ORACLE)
def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("t"))
    per_source = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    totals = per_source.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    global_t = per_source.groupBy("t").agg(F.sum("c").cast("long").alias("g"))
    grand = totals.agg(F.sum("n").cast("long").alias("gt"))
    terms = (
        per_source.join(global_t, "t")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(grand))
        .withColumn("d", F.col("g") - F.col("c"))
        .withColumn("m", F.col("gt") - F.col("n"))
        .filter(F.col("d") > 0)
    )
    # Log-space ratio, never the BIGINT products c*m / d*n: at 100 TB those
    # overflow 2^63 where Spark (ANSI off) wraps silently (r5 advisor
    # finding). The 4-term fold order is left-to-right, matching the oracle.
    llr_e6 = F.floor(
        (F.log2("c") + F.log2("m") - F.log2("d") - F.log2("n")) * 1e6
    ).cast("long")
    return terms.groupBy("source").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_common_terms"),
        F.sum(F.col("c") * llr_e6).cast("long").alias("kl_weighted_e6"),
    )


# ---------------------------------------------------------------------------
# q_embedding_drift — centroid shift between the train and test splits,
# per label: the embedding-pipeline drift monitor (a label whose two
# split centroids diverge signals leakage, skewed sampling, or an
# upstream featurization change). Every element is quantized to e6
# fixed-point BEFORE the per-position integer sum, so the centroid is
# exact under any distributed accumulation order; the cosine between
# the two integer centroids is then a single deterministic expression
# per label. Scale shape: posexplode → (label, split, pos) integer agg
# (one shuffle, 64·|labels|·2 output rows), centroid pairing is a tiny
# self-join — the corpus-sized work is one pass.
# ---------------------------------------------------------------------------

_EMBED_DRIFT_ORACLE = """
WITH tagged AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < 'c'
              THEN 'train' ELSE 'test' END AS split
  FROM embeddings
),
elems AS (
  SELECT label, split, i AS pos,
         CAST(floor(v[CAST(i AS INT)] * 1000000) AS BIGINT) AS q
  FROM tagged CROSS JOIN unnest(range(1, len(v) + 1)) AS u(i)
),
cent AS (
  SELECT label, split, pos,
         CAST(sum(q) AS BIGINT) AS s, count(*) AS n
  FROM elems GROUP BY label, split, pos
),
paired AS (
  SELECT tr.label, tr.pos,
         tr.s * 1.0 / tr.n AS a,
         te.s * 1.0 / te.n AS b
  FROM cent tr JOIN cent te
    ON te.label = tr.label AND te.pos = tr.pos
  WHERE tr.split = 'train' AND te.split = 'test'
)
SELECT label,
       count(*) AS n_dims,
       CAST(floor(
         list_aggregate(list_transform(list_zip(list(a ORDER BY pos),
                                                list(b ORDER BY pos)),
                        p -> p[1] * p[2]), 'sum')
         / (sqrt(list_aggregate(list_transform(list(a ORDER BY pos),
                                x -> x * x), 'sum'))
            * sqrt(list_aggregate(list_transform(list(b ORDER BY pos),
                                  x -> x * x), 'sum')))
         * 1000000) AS BIGINT) AS centroid_cos_e6
FROM paired
GROUP BY label
"""


@register("q_embedding_drift", oracle=_EMBED_DRIFT_ORACLE)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    split = F.when(
        F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 1)
        < "c",
        "train",
    ).otherwise("test")
    elems = emb.select(
        "label",
        split.alias("split"),
        F.posexplode(as_double("embedding")).alias("p0", "x"),
    ).select(
        "label",
        "split",
        (F.col("p0") + 1).alias("pos"),
        F.floor(F.col("x") * 1e6).cast("long").alias("q"),
    )
    cent = elems.groupBy("label", "split", "pos").agg(
        F.sum("q").cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    )
    tr = cent.filter(F.col("split") == "train").select(
        "label", "pos", (F.col("s") / F.col("n")).alias("a")
    )
    te = cent.filter(F.col("split") == "test").select(
        "label", "pos", (F.col("s") / F.col("n")).alias("b")
    )
    paired = tr.join(te, ["label", "pos"])
    # Assemble per-label ordered vectors, then one deterministic cosine.
    vecs = paired.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "a"))), lambda s: s["a"]
        ).alias("va"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "b"))), lambda s: s["b"]
        ).alias("vb"),
    )
    return vecs.select(
        "label",
        "n_dims",
        F.floor(cosine(F.col("va"), F.col("vb")) * 1e6)
        .cast("long")
        .alias("centroid_cos_e6"),
    )


# ---------------------------------------------------------------------------
# q_label_balance — split-balance audit, the companion to
# q_embedding_drift: for each label, are its examples distributed
# between train and test at the corpus-wide ratio? Reports per label
# the observed counts, the expected train count at the global ratio
# (e6 fixed-point), and the imbalance |observed − expected|/expected —
# the check that catches a hash-split interacting badly with how ids
# were assigned (e.g. label correlated with id range). All ratios are
# integer arithmetic over counts; nothing floats.
# ---------------------------------------------------------------------------

_LABEL_BALANCE_ORACLE = """
WITH tagged AS (
  SELECT label,
         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < 'c'
              THEN 1 ELSE 0 END AS is_train
  FROM embeddings
),
per_label AS (
  SELECT label,
         CAST(sum(is_train) AS BIGINT) AS n_train,
         CAST(count(*) - sum(is_train) AS BIGINT) AS n_test,
         count(*) AS n_total
  FROM tagged GROUP BY label
),
globals AS (
  SELECT CAST(sum(n_train) AS BIGINT) AS g_train,
         CAST(sum(n_total) AS BIGINT) AS g_total
  FROM per_label
)
SELECT p.label, p.n_train, p.n_test,
       CAST(p.n_total * g.g_train * 1000000 // g.g_total AS BIGINT)
         AS expected_train_e6,
       CAST(abs(p.n_train * 1000000 -
                p.n_total * g.g_train * 1000000 // g.g_total)
            * 1000000 // (p.n_total * g.g_train * 1000000 // g.g_total)
         AS BIGINT) AS imbalance_e6
FROM per_label p CROSS JOIN globals g
"""


@register("q_label_balance", oracle=_LABEL_BALANCE_ORACLE)
def q_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    is_train = (
        F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 1)
        < "c"
    ).cast("long")
    per_label = emb.select("label", is_train.alias("it")).groupBy("label").agg(
        F.sum("it").cast("long").alias("n_train"),
        (F.count(F.lit(1)) - F.sum("it")).cast("long").alias("n_test"),
        F.count(F.lit(1)).alias("n_total"),
    )
    g = per_label.agg(
        F.sum("n_train").cast("long").alias("g_train"),
        F.sum("n_total").cast("long").alias("g_total"),
    )
    expected = F.expr("n_total * g_train * 1000000 div g_total")
    return per_label.crossJoin(F.broadcast(g)).select(
        "label",
        "n_train",
        "n_test",
        expected.cast("long").alias("expected_train_e6"),
        F.expr(
            "abs(n_train * 1000000 - n_total * g_train * 1000000 div g_total)"
            " * 1000000 div (n_total * g_train * 1000000 div g_total)"
        )
        .cast("long")
        .alias("imbalance_e6"),
    )


# ---------------------------------------------------------------------------
# q_canary_diff — shadow-deployment diff: run quality-gate version A
# (current: length>=20 AND repetition via distinct-token ratio>=0.3)
# and version B (candidate: length>=25 AND ratio>=0.35) over the SAME
# corpus in ONE pass, and report per source how many docs flip
# keep→drop, drop→keep, or agree — the release gate for any filter
# change in a production pipeline (you ship B only after inspecting
# what it would do differently). Both versions are pure column
# predicates over one scan: the canary costs a projection, not a
# second pipeline.
# ---------------------------------------------------------------------------

_CANARY_ORACLE = """
WITH scored AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_uniq
  FROM documents
),
decided AS (
  SELECT source,
         (n_tok >= 20 AND n_uniq * 10 >= n_tok * 3) AS keep_a,
         (n_tok >= 25 AND n_uniq * 20 >= n_tok * 7) AS keep_b
  FROM scored
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_keep_to_drop,
       CAST(sum(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_drop_to_keep,
       CAST(sum(CASE WHEN keep_a = keep_b THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree
FROM decided
GROUP BY source
"""


@register("q_canary_diff", oracle=_CANARY_ORACLE)
def q_canary_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    scored = docs.select(
        "source",
        F.size(t).alias("n_tok"),
        F.size(F.array_distinct(t)).alias("n_uniq"),
    )
    keep_a = (F.col("n_tok") >= 20) & (F.col("n_uniq") * 10 >= F.col("n_tok") * 3)
    keep_b = (F.col("n_tok") >= 25) & (F.col("n_uniq") * 20 >= F.col("n_tok") * 7)
    decided = scored.select(
        "source", keep_a.alias("keep_a"), keep_b.alias("keep_b")
    )
    return decided.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("keep_a") & ~F.col("keep_b")).cast("long"))
        .cast("long")
        .alias("n_keep_to_drop"),
        F.sum((~F.col("keep_a") & F.col("keep_b")).cast("long"))
        .cast("long")
        .alias("n_drop_to_keep"),
        F.sum((F.col("keep_a") == F.col("keep_b")).cast("long"))
        .cast("long")
        .alias("n_agree"),
    )


# ---------------------------------------------------------------------------
# q_lsh_recall — the approximation MEASURED, not assumed: how many of
# the exact Jaccard>=threshold near-dup pairs does the 16-minhash /
# 8-band LSH candidate set actually contain (recall), and how much of
# the candidate set is noise (precision)? This is the tuning loop for
# band/row counts on a new corpus — run q_lsh_recall, adjust, re-run —
# promoted from a pytest invariant to a first-class audited metric.
# Both pair sets come from the session-cached indexes the dedup family
# already builds; the comparison is two tiny joins over pair keys. All
# ratios integer e6 (floor), single summary row.
# ---------------------------------------------------------------------------

_LSH_RECALL_ORACLE = f"""
{{shingles}},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  -- mirror the Spark side's hot-shingle posting-list cap so the two
  -- definitions stay identical at ANY scale (ADVICE r6)
  WHERE a.shingle IN (SELECT shingle FROM sh
                      GROUP BY shingle
                      HAVING count(DISTINCT doc_id) <= {_HOT_SHINGLE_CAP})
  GROUP BY 1, 2
),
exact_pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE c.n_common * 1.0 / (sa.sz + sb.sz - c.n_common) >= {{threshold}}
),
hashes AS (
  SELECT doc_id, ii.i, min(md5(ii.i::VARCHAR || '|' || shingle)) AS mh
  FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS i) ii
  GROUP BY doc_id, ii.i
),
bands AS (
  SELECT doc_id, i // 2 AS band, md5(string_agg(mh, '' ORDER BY i)) AS band_hash
  FROM hashes GROUP BY doc_id, i // 2
),
lsh_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
              AND a.doc_id < b.doc_id
),
common AS (
  SELECT e.doc_a, e.doc_b FROM exact_pairs e
  JOIN lsh_pairs l ON l.doc_a = e.doc_a AND l.doc_b = e.doc_b
)
SELECT (SELECT count(*) FROM exact_pairs) AS n_exact,
       (SELECT count(*) FROM lsh_pairs)   AS n_candidates,
       (SELECT count(*) FROM common)      AS n_common,
       CAST((SELECT count(*) FROM common) * 1000000
            // greatest((SELECT count(*) FROM exact_pairs), 1) AS BIGINT)
         AS recall_e6,
       CAST((SELECT count(*) FROM common) * 1000000
            // greatest((SELECT count(*) FROM lsh_pairs), 1) AS BIGINT)
         AS precision_e6
"""


def _lsh_recall_oracle() -> str:
    from data_ingestion_service_spark.operators.llm import (
        _NEAR_DEDUP_THRESHOLD,
    )
    from data_ingestion_service_spark.operators.llm_extended import _SHINGLE_SQL

    return _LSH_RECALL_ORACLE.format(
        shingles=_SHINGLE_SQL.strip().rstrip(), threshold=_NEAR_DEDUP_THRESHOLD
    )


@register("q_lsh_recall", oracle=_lsh_recall_oracle())
def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.operators.llm_extended import (
        q_minhash_pairs,
    )

    exact = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    lsh = q_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").distinct()
    common = exact.join(lsh, ["doc_a", "doc_b"], "left_semi")
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_common = common.count()
    row = [
        (
            n_exact,
            n_lsh,
            n_common,
            n_common * 1_000_000 // max(n_exact, 1),
            n_common * 1_000_000 // max(n_lsh, 1),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_exact bigint, n_candidates bigint, n_common bigint, "
        "recall_e6 bigint, precision_e6 bigint",
    )


# ---------------------------------------------------------------------------
# q_dedup_best_survivor — quality-ranked survivor selection: real
# pipelines keep each duplicate cluster's BEST copy, not its first —
# the min-id rule (q_near_dedup_survivors) silently prefers whatever
# crawled earliest, which for boilerplate-heavy families is often the
# worst copy. Survivor = argmax (distinct-token count, total tokens,
# -doc_id) per cluster — a quality proxy computable in the same scan.
# One window over rep_id (cluster sizes are bounded by construction);
# reports per source how many survivors CHANGED versus the min-id rule
# — the decision-diff a pipeline owner reviews before switching rules.
# ---------------------------------------------------------------------------

_BEST_SURVIVOR_ORACLE = (
    "WITH comp_full AS MATERIALIZED ("
    + _DUP_CLUSTERS_ORACLE
    + """),
feat AS (
  SELECT c.doc_id, c.rep_id, d.source,
         len(list_distinct(string_split(d.text, ' '))) AS n_uniq,
         len(string_split(d.text, ' ')) AS n_tok
  FROM comp_full c JOIN documents d ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY rep_id
           ORDER BY n_uniq DESC, n_tok DESC, doc_id) AS rn
  FROM feat
)
SELECT source,
       count(*) AS n_clusters_won,
       CAST(sum(n_tok) AS BIGINT) AS surviving_tokens,
       CAST(sum(CASE WHEN doc_id <> rep_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed_vs_min_id
FROM ranked
WHERE rn = 1
GROUP BY source
"""
)


@register("q_dedup_best_survivor", oracle=_BEST_SURVIVOR_ORACLE)
def q_dedup_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from data_ingestion_service_spark.registry import QUERIES

    comp = QUERIES["q_dup_clusters"](spark, sf_dir).select("doc_id", "rep_id")
    t = F.split("text", " ")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.array_distinct(t)).alias("n_uniq"),
        F.size(t).alias("n_tok"),
    )
    feat = comp.join(docs, "doc_id")
    w = Window.partitionBy("rep_id").orderBy(
        F.desc("n_uniq"), F.desc("n_tok"), F.asc("doc_id")
    )
    best = feat.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return best.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clusters_won"),
        F.sum("n_tok").cast("long").alias("surviving_tokens"),
        F.sum((F.col("doc_id") != F.col("rep_id")).cast("long"))
        .cast("long")
        .alias("n_changed_vs_min_id"),
    )


# ---------------------------------------------------------------------------
# q_dedup_waterfall — the pipeline waterfall every data team tracks:
# one row showing corpus size shrinking through the cleaning stages —
# raw docs → exact-unique texts → substring-clean exact reps (the Lee et
# al. exact-substring tier via q_substring_dup's fingerprint pairs) →
# near-dup cluster survivors (min-id) → survivors that are also free of
# test-set 8-gram contamination — with integer e6 retention ratios.
# substring_keep_e6 and near_keep_e6 are both measured against the
# exact-unique stage (the substring and shingle tiers audit the same
# base from two angles; neither is a subset of the other). Every stage
# reuses an already-verified operator's semantics (exact dedup,
# substring fingerprint pairs, connected-component survivors, n-gram
# decontamination), so this key certifies their COMPOSITION: the
# numbers a run report would publish.
# ---------------------------------------------------------------------------

_WATERFALL_ORACLE = (
    "WITH comp_full AS MATERIALIZED ("
    + _DUP_CLUSTERS_ORACLE
    + f"""),
{_WINDOW_HASH_CTE.strip()},
{_SUBDUP_PAIRS_CTE.strip()},
exact_reps AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
sub_kept AS (
  SELECT doc_id FROM exact_reps
  WHERE doc_id NOT IN (SELECT doc_b FROM sub_pairs)
),
survivors AS (
  SELECT c.doc_id FROM comp_full c WHERE c.rep_id = c.doc_id
),
tok2 AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train
  FROM documents
),
grams2 AS (
  SELECT doc_id, is_train,
         unnest(list_transform(range(1, len(t) - {_NGRAM_DECON_K} + 2),
                i -> list_aggregate(t[i : i + {_NGRAM_DECON_K} - 1],
                                    'string_agg', ' '))) AS g
  FROM tok2 WHERE len(t) >= {_NGRAM_DECON_K}
),
test_g AS (SELECT DISTINCT g FROM grams2 WHERE NOT is_train),
contaminated AS (
  SELECT DISTINCT gr.doc_id
  FROM grams2 gr JOIN test_g te ON te.g = gr.g
  WHERE gr.is_train
),
counts AS (
  SELECT
    (SELECT count(*) FROM documents) AS n_raw,
    (SELECT count(DISTINCT md5(text)) FROM documents) AS n_exact_unique,
    (SELECT count(*) FROM sub_kept) AS n_substring_kept,
    (SELECT count(*) FROM survivors) AS n_near_survivors,
    (SELECT count(*) FROM survivors s
       JOIN tok2 t ON t.doc_id = s.doc_id
      WHERE NOT t.is_train
         OR s.doc_id NOT IN (SELECT doc_id FROM contaminated))
      AS n_clean
)
SELECT n_raw, n_exact_unique, n_substring_kept, n_near_survivors, n_clean,
       CAST(n_exact_unique * 1000000 // n_raw AS BIGINT) AS exact_keep_e6,
       CAST(n_substring_kept * 1000000 // n_exact_unique AS BIGINT)
         AS substring_keep_e6,
       CAST(n_near_survivors * 1000000 // n_exact_unique AS BIGINT)
         AS near_keep_e6,
       CAST(n_clean * 1000000 // n_near_survivors AS BIGINT) AS clean_keep_e6
FROM counts
"""
)


@register("q_dedup_waterfall", oracle=_WATERFALL_ORACLE)
def q_dedup_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.registry import QUERIES

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()
    n_exact = docs.select(F.md5(F.col("text").cast("binary"))).distinct().count()
    # Substring rung (Lee et al. exact-substring tier): exact-dedup
    # representatives that do NOT contain a span already seen in an
    # earlier doc (= never the doc_b of a qualifying fingerprint pair).
    exact_reps = (
        docs.groupBy(F.md5(F.col("text").cast("binary")))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    sub_dropped = substring_dup_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    )
    n_sub_kept = exact_reps.join(sub_dropped, "doc_id", "left_anti").count()
    comp = QUERIES["q_dup_clusters"](spark, sf_dir).select("doc_id", "rep_id")
    survivors = comp.filter(F.col("rep_id") == F.col("doc_id")).select("doc_id")
    n_surv = survivors.count()
    is_train = (
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
        < "c"
    )
    tagged = docs.select("doc_id", is_train.alias("is_train"))
    grams = shingle_rows(docs, _NGRAM_DECON_K).join(tagged, "doc_id")
    test_g = (
        grams.filter(~F.col("is_train")).select(F.col("shingle").alias("g")).distinct()
    )
    contaminated = (
        grams.filter(F.col("is_train"))
        .select("doc_id", F.col("shingle").alias("g"))
        .join(test_g, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = (
        survivors.join(tagged, "doc_id")
        .join(contaminated.withColumn("bad", F.lit(1)), "doc_id", "left")
        .filter(~F.col("is_train") | F.col("bad").isNull())
    )
    n_clean = clean.count()
    row = [
        (
            n_raw,
            n_exact,
            n_sub_kept,
            n_surv,
            n_clean,
            n_exact * 1_000_000 // n_raw,
            n_sub_kept * 1_000_000 // n_exact,
            n_surv * 1_000_000 // n_exact,
            n_clean * 1_000_000 // n_surv,
        )
    ]
    return spark.createDataFrame(
        row,
        "n_raw bigint, n_exact_unique bigint, n_substring_kept bigint, "
        "n_near_survivors bigint, n_clean bigint, exact_keep_e6 bigint, "
        "substring_keep_e6 bigint, near_keep_e6 bigint, clean_keep_e6 bigint",
    )


# ---------------------------------------------------------------------------
# q_split_leakage — EXACT cross-split leakage: identical document texts
# appearing in BOTH train and test — the bluntest and most common
# evaluation leak (a duplicated page whose copies hashed to different
# splits). Complements q_ngram_decontaminate (partial overlap) and
# q_contamination_check (near-dup overlap): this is the exact-match
# tier of the same audit. One md5-digest aggregation — text never
# shuffles — then a conditional rollup.
# ---------------------------------------------------------------------------

_SPLIT_LEAK_ORACLE = """
WITH tagged AS (
  SELECT md5(text) AS h,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train
  FROM documents
),
per_text AS (
  SELECT h,
         CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
         CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT) AS n_te
  FROM tagged GROUP BY h
)
SELECT count(*) AS n_distinct_texts,
       CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked_texts,
       CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN n_tr ELSE 0 END)
         AS BIGINT) AS n_train_docs_leaking,
       CAST(sum(CASE WHEN n_tr > 0 AND n_te > 0 THEN n_te ELSE 0 END)
         AS BIGINT) AS n_test_docs_exposed
FROM per_text
"""


@register("q_split_leakage", oracle=_SPLIT_LEAK_ORACLE)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_train = (
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
        < "c"
    )
    per_text = (
        docs.select(
            F.md5(F.col("text").cast("binary")).alias("h"),
            is_train.cast("long").alias("it"),
        )
        .groupBy("h")
        .agg(
            F.sum("it").cast("long").alias("n_tr"),
            (F.count(F.lit(1)) - F.sum("it")).cast("long").alias("n_te"),
        )
    )
    leaked = (F.col("n_tr") > 0) & (F.col("n_te") > 0)
    return per_text.agg(
        F.count(F.lit(1)).alias("n_distinct_texts"),
        F.sum(leaked.cast("long")).cast("long").alias("n_leaked_texts"),
        F.sum(F.when(leaked, F.col("n_tr")).otherwise(0))
        .cast("long")
        .alias("n_train_docs_leaking"),
        F.sum(F.when(leaked, F.col("n_te")).otherwise(0))
        .cast("long")
        .alias("n_test_docs_exposed"),
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
    cnt = bb.groupBy("b").agg(
        F.sum(F.col("is_raw").cast("long")).cast("bigint").alias("rc"),
        F.sum((~F.col("is_raw")).cast("long")).cast("bigint").alias("tc"),
    )
    tot = cnt.agg(
        F.sum("rc").cast("bigint").alias("r_tot"),
        F.sum("tc").cast("bigint").alias("t_tot"),
    )
    ratio = ((F.col("tc") + 1.0) * (F.col("r_tot") + float(_DSIR_BUCKETS))) / (
        (F.col("rc") + 1.0) * (F.col("t_tot") + float(_DSIR_BUCKETS))
    )
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(F.log2(ratio) * 1000000).cast("bigint").alias("term_e6"),
    )
    # The model table is bounded by the bucket count (<= 8192 rows) no
    # matter the corpus size — broadcast it into the feature stream.
    return (
        bb.filter(F.col("is_raw"))
        .join(F.broadcast(terms), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("term_e6").cast("bigint").alias("weight_e6"),
        )
    )


# ---------------------------------------------------------------------------
# q_semdedup — SemDeDup (Abbas et al.): semantic deduplication by
# clustering the embedding space and removing near-duplicates WITHIN
# each cluster — the cross-cluster blindness is the technique's own
# documented approximation (clusters scale with corpus size, so
# within-cluster work stays constant per cluster). Cells here are the
# deterministic 4-plane sign-LSH buckets (q_knn_lsh's construction);
# the qualifying cosine pairs come from q_embed_near_dup's verified
# pruned-block-matmul engine (exact, threshold 0.45), so this key adds
# the SemDeDup decision layer: within a cell, every vector with a
# lower-id partner above threshold is dropped (keep-first). Reports
# per-cell corpus reduction. Scale shape: the pair list is result-sized
# and broadcasts through the two bucket joins; the bucket signature is
# a map-only pass. At production scale cells come from k-means with
# k ∝ N (q_knn_ivf_kmeans shows the assignment pass).
# ---------------------------------------------------------------------------

_SEMDEDUP_ORACLE = f"""
WITH ep AS ({_EMBED_NEAR_DUP_ORACLE}),
sigs AS (
  SELECT vec_id,
         {" + ".join(f"(CASE WHEN {_sql_proj(p)} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(_LSH_PLANES))}
           AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
),
dropped AS (
  SELECT DISTINCT ep.vec_b AS vec_id
  FROM ep
  JOIN sigs sa ON sa.vec_id = ep.vec_a
  JOIN sigs sb ON sb.vec_id = ep.vec_b
  WHERE sa.bucket = sb.bucket
)
SELECT s.bucket,
       count(*) AS n_vecs,
       CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM sigs s LEFT JOIN dropped d ON d.vec_id = s.vec_id
GROUP BY s.bucket
"""


@register("q_semdedup", oracle=_SEMDEDUP_ORACLE)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.registry import QUERIES

    emb = load_table(spark, sf_dir, "embeddings")
    e = as_double("embedding")

    def proj(p: int):
        w = F.array(*[F.lit(v) for v in _LSH_SIGNS[p]])
        return F.aggregate(
            F.zip_with(e, w, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = None
    for p in range(_LSH_PLANES):
        bit = F.when(proj(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    sigs = emb.select("vec_id", bucket.alias("bucket"))
    pairs = QUERIES["q_embed_near_dup"](spark, sf_dir).select("vec_a", "vec_b")
    sa = sigs.select(F.col("vec_id").alias("vec_a"), F.col("bucket").alias("b_a"))
    sb = sigs.select(F.col("vec_id").alias("vec_b"), F.col("bucket").alias("b_b"))
    # Result-sized pair list broadcasts through both bucket lookups; the
    # corpus-sized signature table never moves.
    pa = sa.join(F.broadcast(pairs), "vec_a")
    dropped = (
        sb.join(F.broadcast(pa), "vec_b")
        .filter(F.col("b_a") == F.col("b_b"))
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    flagged = sigs.join(
        dropped.withColumn("is_dropped", F.lit(1)), "vec_id", "left"
    )
    return flagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.when(F.col("is_dropped").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.sum(F.when(F.col("is_dropped").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# q_winnowing_select — actual winnowing fingerprint SELECTION (Schleimer
# et al., MOSS): q_rolling_hash computes every window's Karp-Rabin hash;
# winnowing then keeps only the MINIMUM hash of each sliding window of
# w=4 consecutive window positions, guaranteeing at least one shared
# fingerprint for any match of length >= w+k-1 tokens while storing a
# ~2/(w+1) fraction of hashes — the standard way a 100 TB substring
# index stays sub-corpus-sized. Per-doc windowed min (window partitioned
# by doc_id — embarrassingly parallel across docs, no cross-doc
# shuffle), then the distinct selected set per doc. Both engines run the
# identical ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING frame over the
# identical integer hashes.
# ---------------------------------------------------------------------------

_WINNOW_W = 4  # window positions per winnowing frame

_WINNOWING_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
h AS (
  SELECT doc_id,
         list_transform(t, tok -> ('0x' || substr(md5(tok), 1, 15))::BIGINT
                                  % {_RH_M}) AS ha,
         len(t) AS n
  FROM toks WHERE len(t) >= {_RH_K}
),
w AS (
  SELECT doc_id, s.i AS i, s.wh AS wh
  FROM h, unnest(list_transform(range(1, n - {_RH_K - 2}),
    i -> {{'i': i,
          'wh': ((((ha[i] * {_RH_B} + ha[i+1]) % {_RH_P}) * {_RH_B} + ha[i+2])
                 % {_RH_P} * {_RH_B} + ha[i+3]) % {_RH_P}}})) AS u(s)
),
framed AS (
  SELECT doc_id, i,
         min(wh) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING)
           AS wmin,
         count(*) OVER (PARTITION BY doc_id) AS n_windows
  FROM w
),
full_frames AS (
  -- 1-based i: frame [i, i+3] fits iff i + 3 <= n_windows
  SELECT doc_id, wmin FROM framed WHERE i <= n_windows - {_WINNOW_W - 1}
)
SELECT doc_id,
       count(*) AS n_frames,
       count(DISTINCT wmin) AS n_fingerprints,
       min(wmin) AS fp_min
FROM full_frames
GROUP BY doc_id
"""


@register("q_winnowing_select", oracle=_WINNOWING_ORACLE)
def q_winnowing_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    rows = window_hash_rows(docs)
    # Spark positions are 0-based (oracle's 1-based): the frame content
    # is shift-invariant, so both engines select identical hash sets.
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, _WINNOW_W - 1)
    )
    per_doc = Window.partitionBy("doc_id")
    framed = rows.select(
        "doc_id",
        "i",
        F.min("wh").over(frame).alias("wmin"),
        F.count(F.lit(1)).over(per_doc).alias("n_windows"),
    )
    full = framed.filter(F.col("i") <= F.col("n_windows") - _WINNOW_W)
    return full.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("wmin").alias("n_fingerprints"),
        F.min("wmin").alias("fp_min"),
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
# q_data_card — the one-row corpus datasheet a training-data release
# ships (Datasheets for Datasets, Gebru et al.): volume (docs, tokens,
# chars), provenance spread (sources, languages), and integrity
# (exact-duplicate rate) in exact integers. Two corpus scans — one
# map-side aggregate over everything, one md5-digest distinct — and a
# 1-row result; every number is an associative integer aggregate, so
# the card is reproducible at any cluster size.
# ---------------------------------------------------------------------------

_DATA_CARD_ORACLE = """
WITH base AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         count(DISTINCT source) AS n_sources,
         count(DISTINCT lang) AS n_langs
  FROM documents
),
uniq AS (SELECT count(DISTINCT md5(text)) AS n_exact_unique FROM documents)
SELECT n_docs, n_tokens, n_chars, n_sources, n_langs, n_exact_unique,
       CAST((n_docs - n_exact_unique) * 1000000 // n_docs AS BIGINT)
         AS exact_dup_rate_e6,
       CAST(n_tokens * 100 // n_docs AS BIGINT) AS avg_tokens_e2
FROM base CROSS JOIN uniq
"""


@register("q_data_card", oracle=_DATA_CARD_ORACLE)
def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
    )
    uniq = docs.agg(
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias(
            "n_exact_unique"
        )
    )
    return base.crossJoin(F.broadcast(uniq)).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_sources",
        "n_langs",
        "n_exact_unique",
        F.expr("(n_docs - n_exact_unique) * 1000000 div n_docs").alias(
            "exact_dup_rate_e6"
        ),
        F.expr("n_tokens * 100 div n_docs").alias("avg_tokens_e2"),
    )


# ---------------------------------------------------------------------------
# q_cross_source_leak — provenance audit: duplicated content FLOWING
# BETWEEN sources (syndicated/boilerplate material a per-source dedup
# would miss, and double-counted provenance in the data card's source
# mix). Per unordered source pair, two tiers of the same audit: exact —
# md5-identical texts present in both sources — and near — Jaccard
# near-dup pairs (the shared pair index) whose endpoints live in
# different sources. One digest aggregation plus a pair-index join;
# text never shuffles, and the near tier broadcasts the result-sized
# pair list into the (doc_id, source) projection.
# ---------------------------------------------------------------------------

_CROSS_SOURCE_ORACLE = (
    "WITH nd AS MATERIALIZED ("
    + _NEAR_DEDUP_ORACLE
    + """),
np AS (
  SELECT least(da.source, db.source) AS source_lo,
         greatest(da.source, db.source) AS source_hi,
         count(*) AS n_near_pairs
  FROM nd
  JOIN documents da ON da.doc_id = nd.doc_a
  JOIN documents db ON db.doc_id = nd.doc_b
  WHERE da.source <> db.source
  GROUP BY 1, 2
),
ds AS (SELECT DISTINCT md5(text) AS h, source FROM documents),
ep AS (
  SELECT a.source AS source_lo, b.source AS source_hi,
         count(*) AS n_exact_texts
  FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT coalesce(np.source_lo, ep.source_lo) AS source_lo,
       coalesce(np.source_hi, ep.source_hi) AS source_hi,
       CAST(coalesce(n_near_pairs, 0) AS BIGINT) AS n_near_pairs,
       CAST(coalesce(n_exact_texts, 0) AS BIGINT) AS n_exact_texts
FROM np
FULL OUTER JOIN ep
  ON ep.source_lo = np.source_lo AND ep.source_hi = np.source_hi
"""
)


@register("q_cross_source_leak", oracle=_CROSS_SOURCE_ORACLE)
def q_cross_source_leak(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    src = docs.select("doc_id", "source")
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sa = src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "source", "src_a"
    )
    sb = src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "source", "src_b"
    )
    with_a = sa.join(F.broadcast(pairs), "doc_a")
    np_df = (
        sb.join(F.broadcast(with_a), "doc_b")
        .filter(F.col("src_a") != F.col("src_b"))
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).alias("n_near_pairs"))
    )
    ds = docs.select(
        F.md5(F.col("text").cast("binary")).alias("h"), "source"
    ).distinct()
    ep_df = (
        ds.alias("a")
        .join(
            ds.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source_lo"),
            F.col("b.source").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).alias("n_exact_texts"))
    )
    joined = np_df.alias("np").join(
        ep_df.alias("ep"),
        (F.col("np.source_lo") == F.col("ep.source_lo"))
        & (F.col("np.source_hi") == F.col("ep.source_hi")),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("np.source_lo"), F.col("ep.source_lo")).alias(
            "source_lo"
        ),
        F.coalesce(F.col("np.source_hi"), F.col("ep.source_hi")).alias(
            "source_hi"
        ),
        F.coalesce(F.col("n_near_pairs"), F.lit(0))
        .cast("bigint")
        .alias("n_near_pairs"),
        F.coalesce(F.col("n_exact_texts"), F.lit(0))
        .cast("bigint")
        .alias("n_exact_texts"),
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
# q_l_diversity — the audit k-anonymity misses: an equivalence class can
# satisfy k >= 5 yet expose its members' SENSITIVE attribute if every
# member shares one value (homogeneity attack, Machanavajjhala et al.).
# Per quasi-identifier class (nation x market segment), count distinct
# sensitive values (the account-balance sign+band here) and flag
# classes below l=2 — a class of any size where all members share one
# band leaks that band for anyone re-identified INTO the class. Same
# one-shuffle GROUP BY cost as q_k_anonymity; the two keys together
# form the release gate.
# ---------------------------------------------------------------------------

_L_DIVERSITY_L = 2

_L_DIVERSITY_ORACLE = f"""
WITH tagged AS (
  SELECT c_nationkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 5000 THEN 'low'
              ELSE 'high' END AS bal_band
  FROM customer
),
classes AS (
  SELECT c_nationkey, c_mktsegment,
         count(*) AS class_size,
         count(DISTINCT bal_band) AS l_distinct
  FROM tagged GROUP BY 1, 2
)
SELECT c_nationkey,
       count(*) AS n_classes,
       CAST(sum(CASE WHEN l_distinct < {_L_DIVERSITY_L} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_homogeneous_classes,
       CAST(sum(CASE WHEN l_distinct < {_L_DIVERSITY_L} THEN class_size
                ELSE 0 END) AS BIGINT) AS n_rows_exposed,
       CAST(min(l_distinct) AS BIGINT) AS min_l
FROM classes
GROUP BY c_nationkey
"""


@register("q_l_diversity", oracle=_L_DIVERSITY_ORACLE)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    classes = (
        cust.select("c_nationkey", "c_mktsegment", band.alias("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("bal_band").alias("l_distinct"),
        )
    )
    low = F.col("l_distinct") < _L_DIVERSITY_L
    return classes.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(low.cast("long")).cast("long").alias("n_homogeneous_classes"),
        F.sum(F.when(low, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_rows_exposed"),
        F.min("l_distinct").cast("long").alias("min_l"),
    )


# ---------------------------------------------------------------------------
# q_dedup_incremental — INCREMENTAL admission dedup: the production
# shape at 100 TB is never "re-dedup the whole corpus", it is "admit
# today's batch against the historical index". Incoming docs (hash
# split, ~19%) are checked against the historical majority in two
# tiers: exact (md5 digest membership — a semi-join against the digest
# index) and near (the shared Jaccard pair index, filtered to
# historical↔incoming pairs). Per source: incoming volume, drops per
# tier (exact wins when both fire), admissions. Every structure probed
# here is the one the batch pipeline already maintains — the marginal
# cost of admission is two result-sized joins, not a corpus re-scan.
# ---------------------------------------------------------------------------

_INCR_ORACLE = (
    "WITH nd AS MATERIALIZED ("
    + _NEAR_DEDUP_ORACLE
    + """),
tagged AS (
  SELECT doc_id, source, md5(text) AS h,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'd' AS is_incoming
  FROM documents
),
hist_digests AS (SELECT DISTINCT h FROM tagged WHERE NOT is_incoming),
near_dropped AS (
  SELECT DISTINCT t.doc_id
  FROM tagged t
  JOIN (SELECT doc_a AS x, doc_b AS y FROM nd
        UNION ALL SELECT doc_b, doc_a FROM nd) p ON p.x = t.doc_id
  JOIN tagged o ON o.doc_id = p.y
  WHERE t.is_incoming AND NOT o.is_incoming
),
verdicts AS (
  SELECT t.source,
         CASE WHEN t.h IN (SELECT h FROM hist_digests) THEN 'exact'
              WHEN t.doc_id IN (SELECT doc_id FROM near_dropped) THEN 'near'
              ELSE 'admit' END AS verdict
  FROM tagged t WHERE t.is_incoming
)
SELECT source,
       count(*) AS n_incoming,
       CAST(sum(CASE WHEN verdict = 'exact' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_exact,
       CAST(sum(CASE WHEN verdict = 'near' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_near,
       CAST(sum(CASE WHEN verdict = 'admit' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_admitted
FROM verdicts
GROUP BY source
"""
)


@register("q_dedup_incremental", oracle=_INCR_ORACLE)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    is_incoming = (
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
        >= "d"
    )
    tagged = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("text").cast("binary")).alias("h"),
        is_incoming.alias("is_incoming"),
    )
    hist_digests = (
        tagged.filter(~F.col("is_incoming")).select("h").distinct()
    )
    pairs = near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    directed = pairs.select(
        F.col("doc_a").alias("x"), F.col("doc_b").alias("y")
    ).unionAll(pairs.select(F.col("doc_b").alias("x"), F.col("doc_a").alias("y")))
    flags = tagged.select("doc_id", "is_incoming")
    near_dropped = (
        directed.join(
            flags.withColumnRenamed("doc_id", "x").withColumnRenamed(
                "is_incoming", "in_x"
            ),
            "x",
        )
        .join(
            flags.withColumnRenamed("doc_id", "y").withColumnRenamed(
                "is_incoming", "in_y"
            ),
            "y",
        )
        .filter(F.col("in_x") & ~F.col("in_y"))
        .select(F.col("x").alias("doc_id"))
        .distinct()
    )
    incoming = tagged.filter(F.col("is_incoming"))
    # Digest semi-join carries only (h); the near-drop list is result-
    # sized and broadcast.
    exact_hit = incoming.join(
        hist_digests.withColumn("exact_hit", F.lit(1)), "h", "left"
    )
    both = exact_hit.join(
        F.broadcast(near_dropped.withColumn("near_hit", F.lit(1))),
        "doc_id",
        "left",
    )
    verdict = (
        F.when(F.col("exact_hit").isNotNull(), "exact")
        .when(F.col("near_hit").isNotNull(), "near")
        .otherwise("admit")
    )
    return (
        both.select("source", verdict.alias("verdict"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum((F.col("verdict") == "exact").cast("long"))
            .cast("long")
            .alias("n_dropped_exact"),
            F.sum((F.col("verdict") == "near").cast("long"))
            .cast("long")
            .alias("n_dropped_near"),
            F.sum((F.col("verdict") == "admit").cast("long"))
            .cast("long")
            .alias("n_admitted"),
        )
    )


# ---------------------------------------------------------------------------
# q_quality_ensemble — the multi-signal quality GATE in one scan: three
# per-doc signals (token volume, vocabulary diversity = distinct/total
# token ratio, duplicated-bigram fraction) computed entirely with array
# HOFs inside the document scan — no explode, no per-signal shuffle, no
# join between signal pipelines — then one rollup of per-source pass
# rates. This is the composed filter a curation pipeline runs before
# the expensive dedup stages; at 100 TB it is one map pass + one tiny
# shuffle. Ratios are integer e6 (counts divided as BIGINTs), so the
# gate decision is bit-identical across engines.
# ---------------------------------------------------------------------------

_QE_MIN_TOKENS = 10
_QE_MIN_DISTINCT_E6 = 300_000  # >= 30% distinct tokens
_QE_MAX_DUP_BIGRAM_E6 = 600_000  # <= 60% duplicated bigrams

_QUALITY_ENSEMBLE_ORACLE = f"""
WITH sig AS (
  SELECT source,
         len(t) AS n_tokens,
         len(list_distinct(t)) * 1000000 // len(t) AS distinct_e6,
         CASE WHEN len(t) >= 2 THEN
           (len(bg) - len(list_distinct(bg))) * 1000000 // len(bg)
         ELSE 0 END AS dup_bigram_e6
  FROM (
    SELECT source, t,
           list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
    FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
  )
),
gated AS (
  SELECT source,
         n_tokens >= {_QE_MIN_TOKENS}
           AND distinct_e6 >= {_QE_MIN_DISTINCT_E6}
           AND dup_bigram_e6 <= {_QE_MAX_DUP_BIGRAM_E6} AS pass
  FROM sig
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) * 1000000 // count(*)
         AS BIGINT) AS pass_rate_e6
FROM gated
GROUP BY source
"""


@register("q_quality_ensemble", oracle=_QUALITY_ENSEMBLE_ORACLE)
def q_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Tokenize ONCE into a projected column: a `split(text)` inside the
    # HOF lambda is re-evaluated per ELEMENT on the interpreted HOF path
    # (measured 41s -> ~4s at sf1 for this exact key).
    toked = docs.select("source", tokens("text").alias("t"))
    bg = F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i - 1], ' ', t[i]))")
    n_tokens = F.size("t").cast("bigint")
    distinct_e6 = F.expr(
        "size(array_distinct(t)) * 1000000 div size(t)"
    )
    dup_bigram_e6 = F.when(
        n_tokens >= 2,
        F.expr(
            "(size(bg) - size(array_distinct(bg))) * 1000000 div size(bg)"
        ),
    ).otherwise(0)
    sig = toked.withColumn("bg", bg).select(
        "source",
        n_tokens.alias("n_tokens"),
        distinct_e6.alias("distinct_e6"),
        dup_bigram_e6.cast("bigint").alias("dup_bigram_e6"),
    )
    gate = (
        (F.col("n_tokens") >= _QE_MIN_TOKENS)
        & (F.col("distinct_e6") >= _QE_MIN_DISTINCT_E6)
        & (F.col("dup_bigram_e6") <= _QE_MAX_DUP_BIGRAM_E6)
    )
    return sig.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(gate.cast("long")).cast("long").alias("n_pass"),
        F.expr(
            f"sum(CASE WHEN n_tokens >= {_QE_MIN_TOKENS}"
            f" AND distinct_e6 >= {_QE_MIN_DISTINCT_E6}"
            f" AND dup_bigram_e6 <= {_QE_MAX_DUP_BIGRAM_E6}"
            " THEN 1 ELSE 0 END) * 1000000 div count(*)"
        )
        .cast("bigint")
        .alias("pass_rate_e6"),
    )


# ---------------------------------------------------------------------------
# q_eval_metrics — distributed evaluation of a weak classifier: predict
# each vector's label as the MAJORITY label of its 4-plane sign-LSH
# bucket (deterministic tie-break: smallest label), then emit the
# confusion matrix against the embeddings table's ground-truth labels.
# This is the eval loop a model-quality pipeline runs at corpus scale:
# one map pass for signatures, one bucket-majority aggregate (16 rows),
# broadcast back, one (label, predicted) rollup. All counts exact
# integers; the bucket construction is the same md5-literal hyperplane
# spec both engines share.
# ---------------------------------------------------------------------------

_EVAL_ORACLE = f"""
WITH sigs AS (
  SELECT vec_id, label,
         {" + ".join(f"(CASE WHEN {_sql_proj(p)} >= 0 THEN {1 << p} ELSE 0 END)" for p in range(_LSH_PLANES))}
           AS bucket
  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
),
bucket_counts AS (
  SELECT bucket, label, count(*) AS c FROM sigs GROUP BY 1, 2
),
majority AS (
  SELECT bucket, label AS predicted
  FROM (
    SELECT bucket, label,
           row_number() OVER (PARTITION BY bucket ORDER BY c DESC, label) AS rn
    FROM bucket_counts
  )
  WHERE rn = 1
)
SELECT s.label, m.predicted, count(*) AS n
FROM sigs s JOIN majority m ON m.bucket = s.bucket
GROUP BY 1, 2
"""


@register("q_eval_metrics", oracle=_EVAL_ORACLE)
def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    e = as_double("embedding")

    def proj(p: int):
        w = F.array(*[F.lit(v) for v in _LSH_SIGNS[p]])
        return F.aggregate(
            F.zip_with(e, w, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = None
    for p in range(_LSH_PLANES):
        bit = F.when(proj(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    sigs = emb.select("vec_id", "label", bucket.alias("bucket"))
    counts = sigs.groupBy("bucket", "label").agg(F.count(F.lit(1)).alias("c"))
    rn = F.row_number().over(
        Window.partitionBy("bucket").orderBy(F.desc("c"), F.asc("label"))
    )
    majority = (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("bucket", F.col("label").alias("predicted"))
    )
    # 16-row majority table broadcast back over the signature stream.
    return (
        sigs.join(F.broadcast(majority), "bucket")
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# q_ab_test — two-proportion A/B significance: users hash-split into
# variants (md5 first hex < '8' → A, the reproducible-assignment idiom
# every experiment framework needs), conversion = the user's FIRST
# event is a purchase (a per-user binary with ~1/5 base rate at every
# tier — "has any purchase" saturates to 100% as events-per-user grows,
# a degenerate metric whose pooled variance is zero), and the pooled
# two-proportion z-score decides significance.
# Counts and the e6 rates are exact integers; the z-score's doubles are
# built from those exact integers with one division chain and one IEEE
# sqrt (correctly rounded — identical in both engines), rounded 4dp.
# One user-keyed aggregate + a 2-row rollup: experiment readout costs a
# GROUP BY at any scale.
# ---------------------------------------------------------------------------

_AB_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
per_user AS (
  SELECT user_id,
         substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS is_a,
         max(CASE WHEN rn = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM ordered
  GROUP BY user_id
),
v AS (
  SELECT
    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN is_a THEN converted ELSE 0 END) AS BIGINT) AS ca,
    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
    CAST(sum(CASE WHEN is_a THEN 0 ELSE converted END) AS BIGINT) AS cb
  FROM per_user
)
SELECT na, ca, nb, cb,
       CAST(ca * 1000000 // na AS BIGINT) AS rate_a_e6,
       CAST(cb * 1000000 // nb AS BIGINT) AS rate_b_e6,
       CASE WHEN ca + cb = 0 OR ca + cb = na + nb THEN NULL
            ELSE round((ca * 1.0 / na - cb * 1.0 / nb)
                       / sqrt(((ca + cb) * 1.0 / (na + nb))
                              * (1 - (ca + cb) * 1.0 / (na + nb))
                              * (1.0 / na + 1.0 / nb)), 4)
       END AS z_score
FROM v
"""


@register("q_ab_test", oracle=_AB_ORACLE)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    per_user = (
        ev.select("user_id", "event_type", rn.alias("rn"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("rn") == 1) & (F.col("event_type") == "purchase"), 1
                ).otherwise(0)
            ).alias("converted")
        )
    )
    is_a = (
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 1)
        < "8"
    )
    v = per_user.select(is_a.alias("is_a"), "converted").agg(
        F.sum(F.col("is_a").cast("long")).cast("bigint").alias("na"),
        F.sum(F.when(F.col("is_a"), F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).cast("bigint").alias("nb"),
        F.sum(F.when(~F.col("is_a"), F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    pool = (F.col("ca") + F.col("cb")) * 1.0 / (F.col("na") + F.col("nb"))
    z = (
        F.col("ca") * 1.0 / F.col("na") - F.col("cb") * 1.0 / F.col("nb")
    ) / F.sqrt(pool * (1 - pool) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    # A degenerate experiment (0% or 100% pooled conversion) has zero
    # pooled variance: NULL z in both engines, never a division error.
    degenerate = (F.col("ca") + F.col("cb") == 0) | (
        F.col("ca") + F.col("cb") == F.col("na") + F.col("nb")
    )
    return v.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.expr("ca * 1000000 div na").alias("rate_a_e6"),
        F.expr("cb * 1000000 div nb").alias("rate_b_e6"),
        F.when(~degenerate, F.round(z, 4)).alias("z_score"),
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
    e = near_dup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
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
# q_boilerplate_blocks — CCNet-style per-source boilerplate detection
# and removal accounting: a 10-token block is boilerplate WITHIN a
# source when it recurs across >= 3 distinct documents of that source
# (headers/footers/navigation chrome repeat per site; the threshold is
# per-source because boilerplate is a property of the emitter, not the
# corpus — the cross-corpus complement is q_dup_paragraph_fraction).
# Reports, per source, the block instances removed and the per-doc mean
# removed fraction — what a dedup waterfall's boilerplate stage would
# strip before shingling.
#
# Exactness: pure counting; per-doc fractions floor to e6 BEFORE the
# integer-sum mean (q_dup_paragraph_fraction's discipline). Block
# segmentation is positional 10-token (the fixture has no newlines) and
# identical in both engines.
#
# Scale: block construction is map-side; the one corpus-sized shuffle
# groups by (source, block) with per-doc-distinct fan-in bounding viral
# blocks exactly like the shingle index; flagged-block joins are
# boilerplate-sized.
# ---------------------------------------------------------------------------

_BOILER_MIN_DOCS = 3

_BOILERPLATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
blocks AS (
  SELECT doc_id, source,
         unnest(list_transform(range(0, CAST(floor(len(t) / {_PARA_K}) AS BIGINT)),
                i -> list_aggregate(t[i * {_PARA_K} + 1 : (i + 1) * {_PARA_K}],
                                    'string_agg', ' '))) AS block
  FROM toks
  WHERE len(t) >= {_PARA_K}
),
per_block AS (
  SELECT DISTINCT doc_id, source, block FROM blocks
),
src_block AS (
  SELECT source, block, count(*) AS n_docs_with
  FROM per_block GROUP BY source, block
),
flagged AS (
  SELECT source, block FROM src_block
  WHERE n_docs_with >= {_BOILER_MIN_DOCS}
),
per_doc AS (
  SELECT p.doc_id, p.source,
         count(*) AS n_blocks,
         sum(CASE WHEN f.block IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
  FROM per_block p
  LEFT JOIN flagged f ON f.source = p.source AND f.block = p.block
  GROUP BY p.doc_id, p.source
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(d.n_blocks) AS BIGINT) AS n_block_instances,
       CAST(sum(d.n_boiler) AS BIGINT) AS n_boiler_instances,
       coalesce((SELECT count(*) FROM flagged f WHERE f.source = d.source), 0)
         AS n_boiler_distinct,
       CAST(sum(d.n_boiler * 1000000 // d.n_blocks) // count(*) AS BIGINT)
         AS mean_removed_frac_e6
FROM per_doc d
GROUP BY d.source
"""


@register("q_boilerplate_blocks", oracle=_BOILERPLATE_ORACLE)
def q_boilerplate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", "source", F.split("text", " ").alias("t")
    ).filter(F.size("t") >= _PARA_K)
    exploded = toked.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(0), F.floor(F.size("t") / _PARA_K).cast("long") - 1)
        ).alias("i"),
        "t",
    )
    block = F.concat_ws(
        " ",
        *[F.col("t")[(F.col("i") * _PARA_K + j).cast("int")] for j in range(_PARA_K)],
    )
    per_block = exploded.select("doc_id", "source", block.alias("block")).distinct()
    src_block = per_block.groupBy("source", "block").agg(
        F.count(F.lit(1)).alias("n_docs_with")
    )
    flagged = src_block.filter(
        F.col("n_docs_with") >= _BOILER_MIN_DOCS
    ).select("source", "block", F.lit(1).alias("is_boiler"))
    per_doc = (
        per_block.join(flagged, ["source", "block"], "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler"),
        )
    )
    boiler_counts = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_boiler_distinct")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_blocks").cast("bigint").alias("n_block_instances"),
            F.sum("n_boiler").cast("bigint").alias("n_boiler_instances"),
            F.sum(F.expr("n_boiler * 1000000 div n_blocks")).alias("frac_sum"),
        )
        .join(F.broadcast(boiler_counts), "source", "left")
        .select(
            "source",
            "n_docs",
            "n_block_instances",
            "n_boiler_instances",
            F.coalesce("n_boiler_distinct", F.lit(0))
            .cast("bigint")
            .alias("n_boiler_distinct"),
            F.expr("frac_sum div n_docs").alias("mean_removed_frac_e6"),
        )
    )


# ---------------------------------------------------------------------------
# q_ppl_buckets — CCNet's head/middle/tail corpus split: score every
# document with the corpus-trained bigram LM (q_lm_score's model) and
# split each language into perplexity tertiles — bucket 1 ("head") is
# the most-probable third, bucket 3 ("tail") the least. CCNet keeps
# head+middle and drops or down-weights tail; the per-(lang, bucket)
# row counts and mean scores here are exactly the table that decision
# reads.
#
# Exactness: per-bigram log2 terms floor to e6 before the per-doc
# integer sum (the q_lm_score discipline); the per-doc mean is an
# integer division; ntile orders by (mean desc, doc_id) so tertile
# assignment is total-order deterministic; bucket means are integer
# divisions of exact sums.
#
# Scale: the LM passes are q_lm_score's (bigram + prefix count
# shuffles, model join keyed by bigram); the tertile window partitions
# by lang over per-DOC rows (one row per doc, not per token). At 100 TB
# the ntile becomes a per-lang approx-quantile boundary broadcast —
# same output contract.
# ---------------------------------------------------------------------------

_PPL_BUCKETS_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
  WHERE len(t) >= 2
),
bi2 AS (SELECT doc_id, lang, bg, string_split(bg, ' ')[1] AS w1 FROM bi),
c2 AS (SELECT bg, count(*) AS c2 FROM bi2 GROUP BY bg),
c1 AS (SELECT w1, count(*) AS c1 FROM bi2 GROUP BY w1),
per_doc AS (
  SELECT b.doc_id, b.lang,
         CAST(sum(CAST(floor(log2(c2.c2 * 1.0 / c1.c1) * 1000000) AS BIGINT))
              // count(*) AS BIGINT) AS mean_lp_e6
  FROM bi2 b JOIN c2 ON c2.bg = b.bg JOIN c1 ON c1.w1 = b.w1
  GROUP BY b.doc_id, b.lang
),
bucketed AS (
  SELECT lang, mean_lp_e6,
         ntile(3) OVER (
           PARTITION BY lang ORDER BY mean_lp_e6 DESC, doc_id
         ) AS bucket
  FROM per_doc
)
SELECT lang, bucket,
       count(*) AS n_docs,
       CAST(sum(mean_lp_e6) // count(*) AS BIGINT) AS bucket_mean_lp_e6
FROM bucketed
GROUP BY lang, bucket
"""


@register("q_ppl_buckets", oracle=_PPL_BUCKETS_ORACLE)
def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bi = shingle_rows(docs, 2).select(
        "doc_id",
        F.col("shingle").alias("bg"),
        F.substring_index("shingle", " ", 1).alias("w1"),
    )
    langs = docs.select("doc_id", "lang")
    c2 = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    per_doc = (
        bi.join(c2, "bg")
        .join(c1, "w1")
        .select(
            "doc_id",
            F.floor(F.log2(F.col("c2") * 1.0 / F.col("c1")) * 1000000)
            .cast("bigint")
            .alias("lp_e6"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("lp_e6").alias("lp_sum"),
            F.count(F.lit(1)).alias("n_bi"),
        )
        .join(langs, "doc_id")
        .select("doc_id", "lang", F.expr("lp_sum div n_bi").alias("mean_lp_e6"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.desc("mean_lp_e6"), F.asc("doc_id")
    )
    return (
        per_doc.select("lang", "mean_lp_e6", F.ntile(3).over(w).alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(mean_lp_e6) div count(*)").alias("bucket_mean_lp_e6"),
        )
    )


# ---------------------------------------------------------------------------
# q_log_odds_terms — per-source distinctive vocabulary via the
# smoothed log-odds-ratio z-score (Monroe, Colaresi & Quinn 2008,
# "Fightin' Words"): for each source, the 10 terms whose usage rate
# most exceeds the REST of the corpus, normalized by the estimator's
# variance so rare-term noise doesn't dominate (the failure mode of
# raw TF-IDF "top terms" on skewed corpora). The standard corpus-
# analysis companion to q_source_divergence: KL says HOW FAR a source
# has drifted, log-odds says WHICH WORDS carry the drift.
#
#   δ_w = ln((y_w+1)/(n_i+V-y_w-1)) − ln((r_w+1)/(n_r+V-r_w-1))
#   z_w = δ_w / sqrt(1/(y_w+1) + 1/(r_w+1))        (add-1 prior, α0=V)
#
# Exactness: every input (per-source term count y, rest count r,
# per-source token total n_i, rest total n_r, vocabulary size V) is an
# exact BIGINT from one token-count reduce; z is ONE shared-fragment
# double expression over those integers (identical string evaluated by
# both engines), floored to e6 BEFORE the rank so ordering never
# depends on float comparison. Ties break on the term string.
#
# Scale: one corpus token scan reduced to (source × vocab) counts
# (map-side combinable), rest-counts derived by broadcast-joining the
# GLOBAL term table (vocab-bounded) back — no second corpus pass; the
# rank window partitions by source over vocab-bounded rows.
# ---------------------------------------------------------------------------

_LOGODDS_Z = (
    "((ln((CAST(y AS DOUBLE) + 1.0)"
    " / (CAST(ni AS DOUBLE) + CAST(v AS DOUBLE) - CAST(y AS DOUBLE) - 1.0))"
    " - ln((CAST(r AS DOUBLE) + 1.0)"
    " / (CAST(nr AS DOUBLE) + CAST(v AS DOUBLE) - CAST(r AS DOUBLE) - 1.0)))"
    " / sqrt(1.0 / (CAST(y AS DOUBLE) + 1.0)"
    " + 1.0 / (CAST(r AS DOUBLE) + 1.0)))"
)

_LOG_ODDS_ORACLE = f"""
WITH tf AS MATERIALIZED (
  SELECT source, tok AS term, CAST(count(*) AS BIGINT) AS y
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok <> ''
  GROUP BY 1, 2
),
gterm AS MATERIALIZED (
  SELECT term, CAST(sum(y) AS BIGINT) AS g FROM tf GROUP BY 1
),
tot AS (SELECT source, CAST(sum(y) AS BIGINT) AS ni FROM tf GROUP BY 1),
nall AS (SELECT CAST(sum(g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v
         FROM gterm),
scored AS (
  SELECT tf.source, tf.term, tf.y,
         gterm.g - tf.y          AS r,
         tot.ni                 AS ni,
         nall.n - tot.ni        AS nr,
         nall.v                 AS v
  FROM tf
  JOIN gterm USING (term)
  JOIN tot ON tot.source = tf.source
  CROSS JOIN nall
),
z AS (
  SELECT source, term, y,
         CAST(floor({_LOGODDS_Z} * 1000000) AS BIGINT) AS z_e6
  FROM scored
)
SELECT source, term, y AS n_uses, z_e6
FROM (SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY z_e6 DESC, term) AS rk
      FROM z)
WHERE rk <= 10
"""


@register("q_log_odds_terms", oracle=_LOG_ODDS_ORACLE)
def q_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(tokens("text")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    glob = tf.groupBy("term").agg(F.sum("y").cast("bigint").alias("g"))
    tot = tf.groupBy("source").agg(F.sum("y").cast("bigint").alias("ni"))
    nall = glob.agg(
        F.sum("g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    scored = (
        tf.join(glob, "term")
        .join(F.broadcast(tot), "source")
        .crossJoin(F.broadcast(nall))
        .select(
            "source",
            "term",
            "y",
            (F.col("g") - F.col("y")).alias("r"),
            "ni",
            (F.col("n") - F.col("ni")).alias("nr"),
            "v",
        )
    )
    z = scored.select(
        "source",
        "term",
        "y",
        F.expr(f"CAST(floor({_LOGODDS_Z} * 1000000) AS BIGINT)").alias(
            "z_e6"
        ),
    )
    w = Window.partitionBy("source").orderBy(F.desc("z_e6"), F.asc("term"))
    return (
        z.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("source", "term", F.col("y").alias("n_uses"), "z_e6")
    )


# ---------------------------------------------------------------------------
# q_dedup_threshold_sweep — the near-dedup THRESHOLD TUNING table: for
# nine Jaccard thresholds (0.1 … 0.9), how many candidate pairs and how
# many distinct documents the near-dup stage would touch. Production
# dedup thresholds are picked from exactly this sweep (too low → mass
# false-merging, too high → misses mutations); shipping it as data
# turns the 0.25 constant in q_near_dedup from folklore into a read-off
# of a measured curve.
#
# Exactness: the threshold test is PURE INTEGER — a pair passes t iff
# n_common * 10000 >= t_e4 * (sz_a + sz_b - n_common) — so no float
# jaccard is ever compared; counts are exact BIGINTs.
#
# Scale: pairs come from the same capped posting-list expansion as
# q_near_dedup (the _HOT_SHINGLE_CAP guard bounds the k² blow-up), the
# 9-row threshold dimension is broadcast, and the doc-touch count
# reduces (threshold, doc) pairs — 18× the pair table at most, never
# corpus-shaped. The shingle base comes from the session-persisted
# doc_shingles store (shared with the whole dedup family).
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS_E4 = list(range(1000, 10000, 1000))

# The shared scored_pairs store is persisted pre-filtered at the
# family's minimum threshold; a sweep rung below it would silently
# read a truncated store.
from data_ingestion_service_spark.operators.llm import (  # noqa: E402
    _SCORED_PAIRS_MIN_T_E4 as _STORE_FLOOR_E4,
)

# Explicit raise, not a bare `assert` (which python -O strips): reading
# past the persist floor would silently truncate every rung below it.
if min(_SWEEP_THRESHOLDS_E4) < _STORE_FLOOR_E4:
    raise ValueError(
        "q_dedup_threshold_sweep's lowest rung "
        f"({min(_SWEEP_THRESHOLDS_E4)}) is below the scored_pairs "
        f"persist floor ({_STORE_FLOOR_E4}) — LOWER "
        "llm._SCORED_PAIRS_MIN_T_E4 to the new minimum (or raise the "
        "rung); the store is persisted pre-filtered at the floor"
    )

_SWEEP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM toks
    WHERE len(t) >= 3
  )
),
sizes AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
),
pairs AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b, p.n_common, sa.sz AS sz_a, sb.sz AS sz_b
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  -- mirror the Spark side's hot-shingle posting-list cap so the two
  -- definitions stay identical at ANY scale (ADVICE r6)
  WHERE a.shingle IN (SELECT shingle FROM sh
                      GROUP BY shingle
                      HAVING count(DISTINCT doc_id) <= {_HOT_SHINGLE_CAP})
    GROUP BY 1, 2
  ) p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
),
th AS (SELECT unnest({_SWEEP_THRESHOLDS_E4}) AS t_e4),
hits AS MATERIALIZED (
  SELECT th.t_e4, p.doc_a, p.doc_b
  FROM pairs p CROSS JOIN th
  WHERE p.n_common * 10000 >= th.t_e4 * (p.sz_a + p.sz_b - p.n_common)
)
SELECT h.t_e4,
       CAST(count(*) AS BIGINT) AS n_pairs,
       (SELECT CAST(count(DISTINCT d) AS BIGINT)
        FROM (SELECT doc_a AS d FROM hits h2 WHERE h2.t_e4 = h.t_e4
              UNION ALL
              SELECT doc_b AS d FROM hits h2 WHERE h2.t_e4 = h.t_e4))
         AS n_docs_touched
FROM hits h
GROUP BY 1
"""


@register("q_dedup_threshold_sweep", oracle=_SWEEP_ORACLE)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.operators.llm import scored_pairs

    scored = scored_pairs(spark, sf_dir)
    th = F.explode(
        F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS_E4])
    ).alias("t_e4")
    hits = (
        scored.select("doc_a", "doc_b", "n_common", "sz_a", "sz_b", th)
        .filter(
            F.col("n_common") * 10000
            >= F.col("t_e4")
            * (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
        )
        .select("t_e4", "doc_a", "doc_b")
    )
    n_pairs = hits.groupBy("t_e4").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    n_docs = (
        hits.select(
            "t_e4", F.explode(F.array("doc_a", "doc_b")).alias("d")
        )
        .groupBy("t_e4")
        .agg(F.countDistinct("d").cast("bigint").alias("n_docs_touched"))
    )
    return n_pairs.join(n_docs, "t_e4")


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


# ---------------------------------------------------------------------------
# q_quality_prune_curve — the quality-cut PLANNING table: rank documents
# by an integer quality score (mean token length in e4 — long tokens ≈
# real words, the cheapest of the Gopher-style signals and exactly
# integer), cut into score deciles (1 = best), and report per-decile
# and cumulative docs/tokens retained if the corpus were pruned at that
# level. q_canary_diff answers "what changes if I apply THIS filter";
# this key answers the prior question — "where should the cut be to
# keep X% of tokens" — the curve a data-mix owner reads before fixing
# any threshold.
#
# Exactness: the score is an exact integer division (n_chars·1e4 //
# n_tokens); decile assignment is ntile(10) ordered (score DESC,
# doc_id) — total order, engine-identical; counts/cumulative sums are
# exact BIGINTs; the one share is an e6 integer division.
#
# Scale: one scan → doc-dimension rollup; the ntile window is over docs
# (q_rfm_segments' documented approx-boundary swap applies at 100 TB);
# the cumulative window runs over 10 rows.
# ---------------------------------------------------------------------------

_PRUNE_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         n_chars * 10000 // len(string_split(text, ' ')) AS score_e4
  FROM documents
),
scored AS (
  SELECT n_tokens,
         ntile(10) OVER (ORDER BY score_e4 DESC, doc_id) AS decile
  FROM d
),
per_decile AS (
  SELECT decile,
         CAST(count(*) AS BIGINT)      AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM scored
  GROUP BY 1
)
SELECT decile, n_docs, n_tokens,
       CAST(sum(n_docs) OVER w AS BIGINT)   AS cum_docs,
       CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       CAST(sum(n_tokens) OVER w AS BIGINT) * 1000000
         // CAST(sum(n_tokens) OVER all_w AS BIGINT) AS cum_token_share_e6
FROM per_decile
WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       all_w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
"""


@register("q_quality_prune_curve", oracle=_PRUNE_ORACLE)
def q_quality_prune_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    d = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.expr(
            "n_chars * 10000 div size(split(text, ' '))"
        ).alias("score_e4"),
    )
    scored = d.select(
        "n_tokens",
        F.ntile(10)
        .over(Window.orderBy(F.desc("score_e4"), F.asc("doc_id")))
        .alias("decile"),
    )
    per_decile = scored.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    all_w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_decile.select(
        "decile",
        "n_docs",
        "n_tokens",
        F.sum("n_docs").over(w).cast("bigint").alias("cum_docs"),
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
        (F.sum("n_tokens").over(w).cast("bigint") * 1000000).alias("_num"),
        F.sum("n_tokens").over(all_w).cast("bigint").alias("_den"),
    ).select(
        # integer div, matching the oracle's `//` (float division here
        # could flip the floor on exact-boundary shares)
        "decile",
        "n_docs",
        "n_tokens",
        "cum_docs",
        "cum_tokens",
        F.expr("_num div _den").alias("cum_token_share_e6"),
    )


# ---------------------------------------------------------------------------
# q_dp_counts — differentially-private release machinery for per-source
# document counts: Laplace(b = 1/ε, ε = 1) noise via the inverse CDF
# over a DETERMINISTIC md5 uniform (the repo's sampling discipline:
# noise is a pure function of the release key, so the release is
# reproducible and oracle-checkable — a production deployment swaps the
# md5 uniform for a calibrated DRBG and DROPS the exact column; both
# are kept here because the key's purpose is to verify the MECHANISM:
# inverse-CDF transform, ±noise symmetry, count+noise composition).
# Completes the privacy family: k-anonymity / l-diversity gate
# (equivalence classes), pseudonymization (keyed hashing), GDPR erasure
# (tombstones) — and now noised aggregate release.
#
# Exactness: the uniform is (h + 0.5) / 2^52 with h a 13-hex md5
# BIGINT — h < 2^52 so the double is EXACT, and u ∈ (0,1) strictly
# (no ln(0)); the Laplace transform is the identical expression string
# (_DP_NOISE_EXPR) evaluated by both engines over that exact double;
# the released value floors count + noise once.
#
# Scale: one map-side-combinable count rollup to |sources| rows; the
# noise is a per-row expression. Sensitivity 1 (a document contributes
# to exactly one source count).
# ---------------------------------------------------------------------------

# Shared Laplace inverse-CDF fragment (b = 1.0): evaluated verbatim by
# both engines over the exact double column u.
_DP_NOISE_EXPR = (
    "(CASE WHEN u < 0.5 THEN ln(2.0 * u) ELSE -ln(2.0 - 2.0 * u) END)"
)
_DP_2_52 = float(1 << 52)

_DP_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS exact_count
  FROM documents
  GROUP BY 1
),
n AS (
  SELECT source, exact_count,
         (CAST(('0x' || substr(md5('dp|' || source), 1, 13))::BIGINT
               AS DOUBLE) + 0.5) / {_DP_2_52!r} AS u
  FROM c
)
SELECT source, exact_count,
       CAST(floor({_DP_NOISE_EXPR} * 1000000) AS BIGINT) AS noise_e6,
       CAST(floor(CAST(exact_count AS DOUBLE) + {_DP_NOISE_EXPR}) AS BIGINT)
         AS released_count
FROM n
"""


@register("q_dp_counts", oracle=_DP_ORACLE)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dp|"), F.col("source")).cast("binary")),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    n = c.select(
        "source",
        "exact_count",
        ((h.cast("double") + 0.5) / F.lit(_DP_2_52)).alias("u"),
    )
    return n.select(
        "source",
        "exact_count",
        F.expr(f"CAST(floor({_DP_NOISE_EXPR} * 1000000) AS BIGINT)").alias(
            "noise_e6"
        ),
        F.expr(
            f"CAST(floor(CAST(exact_count AS DOUBLE) + {_DP_NOISE_EXPR})"
            " AS BIGINT)"
        ).alias("released_count"),
    )


# ---------------------------------------------------------------------------
# q_zipf_fit — corpus NATURALNESS audit via the Zipf rank-frequency
# slope: regress ln(freq) on ln(rank) over the term table and report
# the slope (natural language sits near −1; heavily templated or
# synthetic corpora flatten or steepen it) plus R². The one-number
# screen a data-mix owner reads next to q_vocab_growth (Heaps) — Zipf
# is the static law, Heaps the growth law, and corpora that fake one
# usually break the other.
#
# Exactness: ranks are exact integers (freq DESC, term tie-break);
# ln(rank)/ln(freq) are floored to e6 BIGINTs per term BEFORE summing
# (the repo's distributed-sum discipline: integer sums are order-
# independent, double sums are not); the closed-form slope/intercept/R²
# are single fixed-parenthesization double expressions over those exact
# integer sums (q_ols2's solve, 1 feature).
#
# Scale: one token-count reduce (vocabulary-bounded), one rank window
# over the vocab table, one sufficient-statistics aggregate to a 1-row
# output. The corpus is scanned once.
# ---------------------------------------------------------------------------

_ZIPF_SLOPE = (
    "((CAST(sxy AS DOUBLE) / 1000000.0 / 1000000.0"
    " - (CAST(sx AS DOUBLE) / 1000000.0) * (CAST(sy AS DOUBLE) / 1000000.0)"
    " / CAST(n AS DOUBLE))"
    " / (CAST(sxx AS DOUBLE) / 1000000.0 / 1000000.0"
    " - (CAST(sx AS DOUBLE) / 1000000.0) * (CAST(sx AS DOUBLE) / 1000000.0)"
    " / CAST(n AS DOUBLE)))"
)
_ZIPF_R2 = (
    f"(({_ZIPF_SLOPE} * {_ZIPF_SLOPE})"
    " * (CAST(sxx AS DOUBLE) / 1000000.0 / 1000000.0"
    " - (CAST(sx AS DOUBLE) / 1000000.0) * (CAST(sx AS DOUBLE) / 1000000.0)"
    " / CAST(n AS DOUBLE))"
    " / (CAST(syy AS DOUBLE) / 1000000.0 / 1000000.0"
    " - (CAST(sy AS DOUBLE) / 1000000.0) * (CAST(sy AS DOUBLE) / 1000000.0)"
    " / CAST(n AS DOUBLE)))"
)

_ZIPF_ORACLE = f"""
WITH tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY 1
),
ranked AS (
  SELECT CAST(floor(ln(row_number() OVER (ORDER BY freq DESC, tok))
                    * 1000000) AS BIGINT) AS x_e6,
         CAST(floor(ln(freq) * 1000000) AS BIGINT) AS y_e6
  FROM tf
),
s AS (
  SELECT CAST(count(*) AS BIGINT)           AS n,
         CAST(sum(x_e6) AS BIGINT)          AS sx,
         CAST(sum(y_e6) AS BIGINT)          AS sy,
         CAST(sum(x_e6 * x_e6 // 1000000) AS BIGINT) AS sxx,
         CAST(sum(y_e6 * y_e6 // 1000000) AS BIGINT) AS syy,
         CAST(sum(x_e6 * y_e6 // 1000000) AS BIGINT) AS sxy
  FROM ranked
)
SELECT n,
       CASE WHEN n < 2 THEN NULL ELSE
       CAST(floor({_ZIPF_SLOPE.replace("/ 1000000.0 / 1000000.0", "/ 1000000.0 / 1.0")} * 1000000) AS BIGINT) END AS slope_e6,
       CASE WHEN n < 2 THEN NULL ELSE
       CAST(floor({_ZIPF_R2.replace("/ 1000000.0 / 1000000.0", "/ 1000000.0 / 1.0")} * 1000000) AS BIGINT) END AS r2_e6
FROM s
"""


@register("q_zipf_fit", oracle=_ZIPF_ORACLE)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    rk = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = tf.select(
        F.floor(F.log(F.row_number().over(rk).cast("double")) * 1000000)
        .cast("bigint")
        .alias("x_e6"),
        F.floor(F.log(F.col("freq").cast("double")) * 1000000)
        .cast("bigint")
        .alias("y_e6"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_e6").cast("bigint").alias("sx"),
        F.sum("y_e6").cast("bigint").alias("sy"),
        F.sum(F.expr("x_e6 * x_e6 div 1000000")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y_e6 * y_e6 div 1000000")).cast("bigint").alias("syy"),
        F.sum(F.expr("x_e6 * y_e6 div 1000000")).cast("bigint").alias("sxy"),
    )
    slope = _ZIPF_SLOPE.replace("/ 1000000.0 / 1000000.0", "/ 1000000.0 / 1.0")
    r2 = _ZIPF_R2.replace("/ 1000000.0 / 1000000.0", "/ 1000000.0 / 1.0")
    # n < 2 leaves the regression undefined (zero x-variance): NULL on
    # both engines rather than a 0/0 NaN→cast crash on degenerate data.
    return s.select(
        "n",
        F.expr(
            f"CASE WHEN n < 2 THEN NULL ELSE"
            f" CAST(floor({slope} * 1000000) AS BIGINT) END"
        ).alias("slope_e6"),
        F.expr(
            f"CASE WHEN n < 2 THEN NULL ELSE"
            f" CAST(floor({r2} * 1000000) AS BIGINT) END"
        ).alias("r2_e6"),
    )


# ---------------------------------------------------------------------------
# q_prefix_cache_hits — inference KV-cache SHARING audit: group
# documents by their first-8-token prefix and report, per source, how
# many docs share a prefix with at least one other doc (cache hits if
# prefixes were cached), the distinct prefix count, and the hit share.
# Serving stacks (vLLM-style prefix caching, system-prompt reuse) win
# exactly when this number is high; a corpus/prompt-log owner reads it
# to size the cache before provisioning.
#
# Exactness: the prefix is a deterministic md5 over the joined first 8
# tokens; counts are exact BIGINTs; the share is an e6 integer
# division.
#
# Scale: one scan → (source, prefix-digest) reduce (map-side
# combinable) → source rollup. The digest keeps shuffle rows at 16
# bytes regardless of prefix text length.
# ---------------------------------------------------------------------------

_PREFIX_ORACLE = """
WITH p AS (
  SELECT source,
         md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS pfx
  FROM documents
),
g AS (
  SELECT source, pfx, CAST(count(*) AS BIGINT) AS n
  FROM p
  GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT)                     AS n_docs,
       CAST(count(*) AS BIGINT)                   AS n_prefixes,
       CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
         AS n_shared_docs,
       CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT) * 1000000
         // CAST(sum(n) AS BIGINT)                AS shared_share_e6
FROM g
GROUP BY 1
"""


@register("q_prefix_cache_hits", oracle=_PREFIX_ORACLE)
def q_prefix_cache_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pfx = F.md5(
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)).cast("binary")
    )
    g = (
        docs.select("source", pfx.alias("pfx"))
        .groupBy("source", "pfx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return g.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_prefixes"),
        F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_shared_docs"),
        F.expr(
            "cast(sum(case when n >= 2 then n else 0 end) * 1000000"
            " div sum(n) as bigint)"
        ).alias("shared_share_e6"),
    )


# ---------------------------------------------------------------------------
# q_vocab_coverage — tokenizer vocabulary sizing curve: what share of
# corpus TOKEN OCCURRENCES the top-k most frequent word types cover,
# for k ∈ {8, 16, 24, 31} (the fixture vocabulary is ~31 types; at
# production scale the ks would be 2^13…2^17). This is the curve that
# sizes a word-level vocab (or decides BPE is needed): coverage@k
# flattening early means a small vocab suffices; a long tail means
# subword units. Companion to q_zipf_fit (the law) and q_bpe_tokenize
# (the subword answer).
#
# Exactness: frequencies and the rank are exact integers (freq DESC,
# token tie-break); coverage is an e6 integer division of exact sums.
#
# Scale: one token-count reduce (vocabulary-bounded), one rank window
# over the vocab table, a 4-row threshold explode over it. The corpus
# is scanned once.
# ---------------------------------------------------------------------------

_VC_KS = [8, 16, 24, 31]

_VOCAB_COVERAGE_ORACLE = f"""
WITH tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
  GROUP BY 1
),
ranked AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, tok) AS rk,
         CAST(sum(freq) OVER () AS BIGINT) AS total
  FROM tf
),
ks AS (SELECT unnest({_VC_KS}) AS k)
SELECT ks.k,
       CAST(sum(CASE WHEN rk <= ks.k THEN freq ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       CAST(min(total) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN rk <= ks.k THEN freq ELSE 0 END) AS BIGINT)
         * 1000000 // CAST(min(total) AS BIGINT) AS coverage_e6
FROM ranked CROSS JOIN ks
GROUP BY ks.k
"""


@register("q_vocab_coverage", oracle=_VOCAB_COVERAGE_ORACLE)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    w_rk = Window.orderBy(F.desc("freq"), F.asc("tok"))
    w_all = Window.orderBy(F.desc("freq"), F.asc("tok")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = tf.select(
        "freq",
        F.row_number().over(w_rk).alias("rk"),
        F.sum("freq").over(w_all).cast("bigint").alias("total"),
    )
    ks = F.explode(F.array(*[F.lit(k) for k in _VC_KS])).alias("k")
    return (
        ranked.select("freq", "rk", "total", ks)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("freq")).otherwise(0))
            .cast("bigint")
            .alias("covered_tokens"),
            F.min("total").cast("bigint").alias("total_tokens"),
        )
        .select(
            "k",
            "covered_tokens",
            "total_tokens",
            F.expr("covered_tokens * 1000000 div total_tokens").alias(
                "coverage_e6"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_score_calibrate — per-source QUANTILE NORMALIZATION of the quality
# score: each doc's score becomes its percent-rank WITHIN its source
# (e6). The calibration step before any global quality threshold:
# sources differ systematically (boilerplate style, length norms), so
# one absolute cutoff over-prunes some sources and under-prunes others
# — rank-normalizing first makes "keep the top 60%" mean the same
# thing in every source. Output keeps raw score beside the calibrated
# one plus each doc's global percentile for the audit diff.
#
# Exactness: the score is the exact integer mean-token-length e4
# (q_quality_prune_curve's score); percent-rank is (rank−1)/(n−1)
# computed as an e6 integer division of exact window counts with a
# deterministic (score, doc_id) tie-break — the builtin percent_rank
# ties differently across engines, so it is built from row_number
# explicitly.
#
# Scale: two windows (per-source, global) over the doc-dimension
# score table; at 100 TB the global rank swaps to approx-percentile
# boundaries (q_rfm_segments' documented swap), the per-source one
# partitions by source.
# ---------------------------------------------------------------------------

_CALIBRATE_ORACLE = """
WITH d AS (
  SELECT doc_id, source,
         n_chars * 10000 // len(string_split(text, ' ')) AS score_e4
  FROM documents
),
r AS (
  SELECT doc_id, source, score_e4,
         row_number() OVER (PARTITION BY source ORDER BY score_e4, doc_id)
           AS rk_src,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src,
         row_number() OVER (ORDER BY score_e4, doc_id) AS rk_all,
         CAST(count(*) OVER () AS BIGINT) AS n_all
  FROM d
)
SELECT doc_id, source, score_e4,
       CASE WHEN n_src = 1 THEN 1000000
            ELSE (rk_src - 1) * 1000000 // (n_src - 1) END AS calibrated_e6,
       CASE WHEN n_all = 1 THEN 1000000
            ELSE (rk_all - 1) * 1000000 // (n_all - 1) END AS global_e6
FROM r
"""


@register("q_score_calibrate", oracle=_CALIBRATE_ORACLE)
def q_score_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.expr("n_chars * 10000 div size(split(text, ' '))").alias(
            "score_e4"
        ),
    )
    w_src = Window.partitionBy("source").orderBy("score_e4", "doc_id")
    w_src_all = Window.partitionBy("source").orderBy(
        "score_e4", "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_all = Window.orderBy("score_e4", "doc_id")
    w_all_full = Window.orderBy("score_e4", "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = d.select(
        "doc_id",
        "source",
        "score_e4",
        # row_number() is INT in Spark; the e6 multiply below needs LONG
        # (500k docs * 1e6 overflows int32 at sf1)
        F.row_number().over(w_src).cast("bigint").alias("rk_src"),
        F.count(F.lit(1)).over(w_src_all).cast("bigint").alias("n_src"),
        F.row_number().over(w_all).cast("bigint").alias("rk_all"),
        F.count(F.lit(1)).over(w_all_full).cast("bigint").alias("n_all"),
    )
    return r.select(
        "doc_id",
        "source",
        "score_e4",
        F.when(F.col("n_src") == 1, F.lit(1000000).cast("bigint"))
        .otherwise(F.expr("(rk_src - 1) * 1000000 div (n_src - 1)"))
        .alias("calibrated_e6"),
        F.when(F.col("n_all") == 1, F.lit(1000000).cast("bigint"))
        .otherwise(F.expr("(rk_all - 1) * 1000000 div (n_all - 1)"))
        .alias("global_e6"),
    )


# ---------------------------------------------------------------------------
# q_dup_quality_bias — does duplication correlate with quality? Every
# doc is assigned its dedup tier — 'exact' (shares a full-text digest),
# else 'near' (member of a shingle-Jaccard ≥ 0.25 pair), else 'unique'
# — and each tier reports doc count and mean quality score. The
# question decides WHERE the quality filter runs in the waterfall: if
# dups skew low-quality, dedup-first wastes quality-scoring compute on
# doomed docs; if they don't, order is free. A real mix-owner question
# answered by joining two existing families (dedup stores × quality
# score) — no new corpus passes.
#
# Exactness: tier assignment is exact set membership with fixed
# precedence (exact > near > unique); the mean is an integer division
# of exact e4 score sums.
#
# Scale: digest groups are one reduce; near members come from the
# session-persisted scored_pairs store (near-dup-density-sized,
# broadcast); the score is a map-side expression on the one doc scan.
# ---------------------------------------------------------------------------

_DUP_QUALITY_ORACLE = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, md5(text) AS digest,
         n_chars * 10000 // len(string_split(text, ' ')) AS score_e4
  FROM documents
),
dup_digests AS (
  SELECT digest FROM d GROUP BY digest HAVING count(*) >= 2
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    WHERE len(t) >= 3
  )
),
sizes AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1
),
np AS MATERIALIZED (
  SELECT p.doc_a, p.doc_b
  FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  -- mirror the Spark side's hot-shingle posting-list cap so the two
  -- definitions stay identical at ANY scale (ADVICE r6)
  WHERE a.shingle IN (SELECT shingle FROM sh
                      GROUP BY shingle
                      HAVING count(DISTINCT doc_id) <= {_HOT_SHINGLE_CAP})
    GROUP BY 1, 2
  ) p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  WHERE 4 * p.n_common >= sa.sz + sb.sz - p.n_common
),
near_members AS (
  SELECT DISTINCT m FROM (
    SELECT doc_a AS m FROM np UNION ALL SELECT doc_b FROM np
  )
)
SELECT CASE WHEN dd.digest IS NOT NULL THEN 'exact'
            WHEN nm.m IS NOT NULL THEN 'near'
            ELSE 'unique' END AS tier,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.score_e4) // count(*) AS BIGINT) AS mean_score_e4
FROM d
LEFT JOIN dup_digests dd ON dd.digest = d.digest
LEFT JOIN near_members nm ON nm.m = d.doc_id
GROUP BY 1
"""


@register("q_dup_quality_bias", oracle=_DUP_QUALITY_ORACLE)
def q_dup_quality_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_ingestion_service_spark.operators.llm import scored_pairs

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.expr("n_chars * 10000 div size(split(text, ' '))").alias(
            "score_e4"
        ),
    )
    dup_digests = (
        d.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("digest", F.lit(1).alias("is_exact"))
    )
    near = scored_pairs(spark, sf_dir).filter(
        4 * F.col("n_common")
        >= F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    )
    near_members = (
        near.select(F.col("doc_a").alias("m"))
        .unionAll(near.select(F.col("doc_b").alias("m")))
        .distinct()
        .select("m", F.lit(1).alias("is_near"))
    )
    tier = (
        F.when(F.col("is_exact").isNotNull(), "exact")
        .when(F.col("is_near").isNotNull(), "near")
        .otherwise("unique")
    )
    return (
        d.join(F.broadcast(dup_digests), "digest", "left")
        .join(
            F.broadcast(near_members),
            d["doc_id"] == near_members["m"],
            "left",
        )
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("cast(sum(score_e4) div count(*) as bigint)").alias(
                "mean_score_e4"
            ),
        )
    )
