"""Text-processing column helpers for the documents table.

Tokenization is whitespace splitting (the fixture corpus is pre-normalized
word soup, FIXTURES.md); shingling builds k-grams positionally with
built-in ``transform``/``sequence`` so the same shingles are derivable in
ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.split(col, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def shingle_rows(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) rows via codegen-friendly explode.

    ``explode(sequence(...))`` + positional ``getItem`` stays inside
    whole-stage codegen; building the array with ``transform`` lambdas and
    exploding it runs the higher-order function on the interpreted path —
    measured ~8× slower at sf0.1. Same shingles, same order.
    """
    toked = docs.select("doc_id", tokens(text_col).alias("t")).filter(
        F.size("t") >= k
    )
    exploded = toked.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.size("t") - k)).alias("i"), "t"
    )
    return exploded.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.col("t")[F.col("i") + j] for j in range(k)]
        ).alias("shingle"),
    )
