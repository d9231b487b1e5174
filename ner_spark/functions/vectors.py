"""Vector math over array<float> embedding columns — native expressions.

Dot/norm/cosine are sequential left-folds in float64 (`F.aggregate`),
matching DuckDB's list_dot_product over DOUBLE[] bit-for-bit, which is
what makes the ANN queries oracle-checkable. For bulk top-k the
batched numpy path in operators/similarity.py is the throughput
kernel; these expressions are the semantic ground truth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a, b) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))
