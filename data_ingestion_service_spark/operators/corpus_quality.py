"""Corpus quality / audit / privacy family (split out of corpus_ops.py in
round 7 — pure move, no behavior change): quality scoring (repetition,
entropy, bigram-LM, perplexity buckets, boilerplate, ensemble gate, prune
curve, calibration), corpus audits (source divergence, embedding drift,
label balance, canary diff, zipf fit, vocab coverage, eval metrics, A/B
test, log-odds terms, data card, prefix-cache hits), and the privacy tier
(PII redaction, text normalization, k-anonymity, l-diversity, DP counts).
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
from data_ingestion_service_spark.operators.corpus_dedup import (  # noqa: F401
    _LSH_PLANES,
    _PARA_K,
    _lsh_sigs_arrow,
    _sql_proj,
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
    and how dominant is its single most frequent bigram.

    r12 shape: ZERO shuffles. Every statistic is a function of ONE
    document's own bigrams, so it folds inside the row — sort the doc's
    bigram array, then one aggregate() pass counts distincts (value
    changes) and the max run (= max bigram count). The former
    explode → groupBy(doc_id, shingle) → groupBy(doc_id) shape shuffled
    the full bigram STRING stream (partial aggregation barely reduces
    it: within-doc bigrams are mostly distinct), which at 100 TB is a
    corpus-sized exchange for a per-doc statistic (guide §2.3/§2.4 —
    the biggest lever is not shuffling at all). The trade is interpreted
    per-element lambda CPU (HOFs never codegen) for zero network, and it
    wins even locally (same-session A/B: 1.35 → 1.16s warm, identical
    rows)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("t")).filter(
        F.size("t") >= 2
    )
    st = F.expr(
        """
      aggregate(
        array_sort(transform(sequence(0, size(t)-2),
                             i -> concat(t[i], ' ', t[i+1]))),
        named_struct('prev', cast(null as string), 'run', cast(0 as bigint),
                     'mx', cast(0 as bigint), 'nd', cast(0 as bigint)),
        (s, x) -> named_struct(
            'prev', x,
            'run', IF(s.prev IS NOT NULL AND x = s.prev,
                      s.run + 1, cast(1 as bigint)),
            'mx', greatest(s.mx, IF(s.prev IS NOT NULL AND x = s.prev,
                                    s.run + 1, cast(1 as bigint))),
            'nd', s.nd + IF(s.prev IS NULL OR x != s.prev,
                            cast(1 as bigint), cast(0 as bigint))),
        s -> named_struct('mx', s.mx, 'nd', s.nd))
    """
    )
    r = t.select(
        "doc_id",
        (F.size("t") - 1).cast("bigint").alias("n_bigrams"),
        st.alias("st"),
    )
    return r.select(
        "doc_id",
        "n_bigrams",
        F.col("st.nd").alias("n_distinct"),
        F.round(1 - F.col("st.nd") / F.col("n_bigrams"), 4).alias(
            "dup_bigram_frac"
        ),
        F.round(F.col("st.mx") / F.col("n_bigrams"), 4).alias(
            "top_bigram_frac"
        ),
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

        from data_ingestion_service_spark.chaos import maybe_fail

        maybe_fail("text_normalize")  # retry rung (no-op unless enabled)
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
    # Shared Arrow signature kernel (round 8); label rides through the
    # kernel so the pass stays join-free.
    sigs = _lsh_sigs_arrow(emb, extra=("label",)).select(
        "vec_id", "label", "bucket"
    )
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
