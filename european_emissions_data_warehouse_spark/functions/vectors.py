"""Vector column functions over `array<float>` embeddings.

All JVM-side higher-order functions (`zip_with` + `aggregate`) — no Python
UDFs in the hot path, so the expressions stay inside whole-stage codegen and
scale linearly with partition count.  Computation is promoted to double for
cross-engine numeric stability (DuckDB's list_cosine_similarity on a
FLOAT[] cast to DOUBLE[] matches bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm of an array column (double)."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns (double)."""
    return dot(a, b) / (norm(a) * norm(b))
