"""Data layout for scan pruning: range-sorted and Z-ordered parquet.

At 100 TB the fastest scan is the one that never reads the file: parquet
footers carry per-column min/max, and engines (Spark, DuckDB, Trino)
skip whole files/row-groups whose stats exclude the predicate. That only
works when the writer CLUSTERS values — a randomly-partitioned write
gives every file the full value range and no skip ever fires.

Two clustering writers:

- ``write_range_sorted``: repartitionByRange + sortWithinPartitions on
  the sort key — non-overlapping per-file ranges, ideal skipping for
  prefix predicates on the sort key (the 1-D case; this is what
  ``ORDER BY`` table layout means in warehouse engines).
- ``write_zordered``: cluster by the Morton (Z-order) interleave of TWO
  integer-coded keys, so per-file bounding boxes are tight in BOTH
  dimensions — predicates on either column (or both) skip files, at the
  cost of each dimension's ranges being ~sqrt of the 1-D case. The
  interleave is pure column expressions (shiftleft/bitwise-or over 32
  bits), no UDF.

Both cost exactly one range-shuffle at write time and nothing at read
time. The range boundaries come from Spark's range-partitioner sampling;
at cluster scale raise ``spark.sql.execution.rangeExchange.sampleSizePerPartition``
if key skew misbalances files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def write_range_sorted(df: DataFrame, path: str, sort_cols: list[str],
                       n_files: int = 8, mode: str = "overwrite") -> None:
    """Cluster rows into ``n_files`` range partitions of ``sort_cols``
    and sort within each — every output file covers a disjoint slice of
    the key space, so footer min/max prunes exactly like a coarse
    index."""
    (df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
       .sortWithinPartitions(*sort_cols)
       .write.mode(mode).parquet(path))


def zvalue(a: Column, b: Column, bits: int = 21) -> Column:
    """Morton interleave of two non-negative integer columns into one
    LONG (bit i of a -> bit 2i, bit i of b -> bit 2i+1). ``bits`` per
    dimension (default 21: 2 x 21 = 42 result bits, safely inside a
    signed 64-bit long). Values are masked to ``bits`` first — callers
    should rank/quantize unbounded keys before interleaving."""
    mask = (1 << bits) - 1
    a = a.cast("long").bitwiseAND(F.lit(mask))
    b = b.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 8, bits: int = 21,
                   mode: str = "overwrite") -> None:
    """Cluster rows by the Z-value of (col_a, col_b): range-partition +
    sort on the interleave, drop the helper column on write. Each output
    file then covers a small bounding box in BOTH dimensions — min/max
    skipping fires for predicates on either column, which no 1-D sort
    can give."""
    (df.withColumn("_z", zvalue(F.col(col_a), F.col(col_b), bits))
       .repartitionByRange(n_files, F.col("_z"))
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode(mode).parquet(path))
