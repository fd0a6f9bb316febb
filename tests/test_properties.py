"""Property-based tests (hypothesis): drive the REAL operators with
generated inputs staged as parquet, and check invariants that must hold
for ANY data — a third line of defense beyond oracle parity (fixed
fixture) and hand-written invariants (fixed cases). Examples are kept
small and few (each one stages files and runs Spark jobs); the value is
the generator exploring shapes the fixtures never take: empty sources,
single-doc corpora, all-identical texts, adversarial token counts.
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_service_spark.registry import QUERIES, load_all_operators

load_all_operators()

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _stage_documents(spark, rows):
    """Write generated (doc_id, source, text) rows as a documents table
    (plus empty companions the loaders don't touch) and return the dir."""
    d = tempfile.mkdtemp(prefix="prop_docs_")
    spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


docs_strategy = st.lists(
    st.tuples(
        st.text(alphabet="ab ", min_size=1, max_size=40).map(
            lambda t: " ".join(t.split()) or "a"
        ),
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=1,
    max_size=30,
).map(
    lambda texts: [
        (i, src, txt) for i, (txt, src) in enumerate(texts)
    ]
)


@settings(**_SETTINGS)
@given(rows=docs_strategy)
def test_pack_sequences_conserves_docs_and_tokens(spark, rows):
    """Packing must PARTITION the corpus: every doc lands in exactly one
    sequence (n_docs sums to corpus size), token mass is conserved, and
    within each (source, shard) the seq_ids start at 0 with doc-id
    ranges that never overlap between consecutive sequences."""
    sf = _stage_documents(spark, rows)
    out = QUERIES["q_pack_sequences"](spark, sf).collect()
    assert sum(r.n_docs for r in out) == len(rows)
    expected_tokens = sum(len(t.split(" ")) for _, _, t in rows)
    assert sum(r.total_tokens for r in out) == expected_tokens
    by_shard: dict[tuple, list] = {}
    for r in out:
        by_shard.setdefault((r.source, r.shard), []).append(r)
    for seqs in by_shard.values():
        seqs.sort(key=lambda r: r.seq_id)
        assert seqs[0].seq_id == 0
        for a, b in zip(seqs, seqs[1:]):
            assert a.last_doc < b.first_doc  # ranges ordered, disjoint


@settings(**_SETTINGS)
@given(rows=docs_strategy)
def test_dedup_docs_counts_any_corpus(spark, rows):
    """Exact-dedup invariants on arbitrary corpora: n_docs equals the
    corpus size, n_unique equals the number of distinct texts, and
    n_dupes reconciles the two."""
    sf = _stage_documents(spark, rows)
    [r] = QUERIES["q_dedup_docs"](spark, sf).collect()
    assert r.n_docs == len(rows)
    assert r.n_unique == len({t for _, _, t in rows})
    assert r.n_dupes == r.n_docs - r.n_unique


@settings(**_SETTINGS)
@given(
    vec=st.lists(
        st.floats(
            min_value=-100,
            max_value=100,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=4,
        max_size=16,
    ).filter(lambda v: any(x != 0 for x in v))
)
def test_embed_quantize_error_bound_any_vector(spark, vec):
    """int8 quantization on ARBITRARY float vectors: codes stay within
    [-127, 127], the max-magnitude element maps to ±127, and every
    element's reconstruction error is <= scale/2 (+1 ulp slack)."""
    d = tempfile.mkdtemp(prefix="prop_emb_")
    spark.createDataFrame(
        [(1, vec)], "vec_id bigint, embedding array<float>"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    [r] = QUERIES["q_embed_quantize"](spark, d).collect()
    scale = r.scale_e9 / 1e9
    assert r.max_abs_err_e6 / 1e6 <= scale / 2 + 1e-6
    # reconstruct codes python-side with the same formula to check range
    import math

    fvec = [float(f"{x:.9g}") for x in vec]  # f32-ish view is fine here
    mx = max(abs(x) for x in fvec)
    s = mx / 127.0
    codes = [max(-127, min(127, math.floor(x / s + 0.5))) for x in fvec]
    assert max(abs(c) for c in codes) == 127
    assert all(-127 <= c <= 127 for c in codes)
