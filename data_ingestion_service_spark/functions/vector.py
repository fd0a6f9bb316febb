"""Vector math over ``array<float>`` embedding columns.

Everything here is built-in higher-order functions (``zip_with`` /
``aggregate``) — whole-stage-codegen'd JVM expressions, no Python in the
row path. Inputs are cast to ``array<double>`` so the fold accumulates in
f64 in deterministic left-to-right order (matches DuckDB's ``DOUBLE[]``
list aggregates bit-for-bit on identical f32 inputs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    return F.col(vec).cast("array<double>") if isinstance(vec, str) else vec.cast(
        "array<double>"
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two equal-length double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe only insofar as inputs are non-null."""
    return dot(a, b) / (norm(a) * norm(b))
