"""Vector column functions over array<float|double> embeddings.

Everything is expression-level (F.aggregate / F.zip_with / F.transform) —
JVM-side fold, no Python per row. Inputs are cast element-wise to double
FIRST (float->double is exact), so dot products accumulate left-to-right
in double precision identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot / sqrt(na) / sqrt(nb) — fixed association, mirrored verbatim
    in the oracle SQL so doubles match bit-for-bit."""
    return dot(a, b) / l2_norm(a) / l2_norm(b)
