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
    in the oracle SQL so doubles match bit-for-bit. A zero vector has
    no direction: its similarity is defined as 0.0 (try_divide instead
    of a bare /, which raises DIVIDE_BY_ZERO under default ANSI mode;
    the fixtures carry no zero vectors, so oracle hashes are
    unaffected). NULL inputs still propagate NULL — only a zero NORM
    maps to 0.0."""
    na, nb = l2_norm(a), l2_norm(b)
    raw = F.try_divide(F.try_divide(dot(a, b), na), nb)
    return F.when((na * nb) == 0, F.lit(0.0)).otherwise(raw)
