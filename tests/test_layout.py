"""Layout writers: the parquet footers must actually carry the tight
per-file min/max stats that make engines skip files — that IS the
feature, so the tests assert on the footers, not just on row equality."""

from __future__ import annotations

import glob
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from asvsp_spark.sources.layout import (write_range_sorted, write_zordered,
                                        zvalue)


def _file_stats(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet file (merged across row groups)."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_range_sorted_files_are_disjoint(spark):
    d = tempfile.mkdtemp(prefix="layout-range-")
    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"),
        F.col("id").alias("payload"))
    write_range_sorted(df, d, ["k"], n_files=8)
    stats = sorted(_file_stats(d, "k"))
    assert len(stats) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(stats, stats[1:]):
        assert hi1 <= lo2, "file key ranges must not overlap"
    # data survives intact
    assert spark.read.parquet(d).count() == 10_000
    assert spark.read.parquet(d).agg(F.sum("k")).first()[0] == \
        df.agg(F.sum("k")).first()[0]


def test_zorder_bounds_both_dimensions(spark):
    """Z-ordered files must have small bounding boxes in BOTH columns:
    the summed box area stays a small fraction of files x full-area
    (a 1-D sort on either column gives ~full range in the other)."""
    n, files = 20_000, 16
    d = tempfile.mkdtemp(prefix="layout-z-")
    df = spark.range(0, n).select(
        (F.col("id") * 7919 % 1024).alias("x"),
        (F.col("id") * 104729 % 1024).alias("y"))
    write_zordered(df, d, "x", "y", n_files=files, bits=10)
    sx = _file_stats(d, "x")
    sy = _file_stats(d, "y")
    assert len(sx) == len(sy) >= files // 2
    full_area = 1024 * 1024
    area = sum((hx - lx + 1) * (hy - ly + 1)
               for (lx, hx), (ly, hy) in zip(sx, sy))
    # perfect z-clustering gives ~full_area total; random placement gives
    # ~files x full_area. Require better than a quarter of random.
    assert area < full_area * len(sx) / 4
    assert spark.read.parquet(d).count() == n


def test_zvalue_interleave_is_monotone_in_blocks():
    """Bit interleave sanity on literals: z(0,0)=0, z(1,0)=1, z(0,1)=2,
    z(1,1)=3, and the 2x2 block structure holds at the next level."""
    import sys
    sys.path.insert(0, "/root/repo")
    from asvsp_spark.session import get_session
    spark = get_session("z", master="local[2]")
    rows = [(a, b) for a in range(4) for b in range(4)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", zvalue(F.col("a"), F.col("b"), bits=4).alias("z"))
    z = {(r.a, r.b): r.z for r in df.collect()}
    assert z[(0, 0)] == 0 and z[(1, 0)] == 1
    assert z[(0, 1)] == 2 and z[(1, 1)] == 3
    assert z[(2, 0)] == 4 and z[(0, 2)] == 8 and z[(3, 3)] == 15


def test_range_sorted_rejects_nothing_but_roundtrips_types(spark):
    d = tempfile.mkdtemp(prefix="layout-types-")
    df = spark.createDataFrame(
        [("b", 2.5), ("a", 1.0), ("c", -3.0)], "k string, v double")
    write_range_sorted(df, d, ["k"], n_files=2)
    got = sorted((r.k, r.v) for r in spark.read.parquet(d).collect())
    assert got == [("a", 1.0), ("b", 2.5), ("c", -3.0)]
