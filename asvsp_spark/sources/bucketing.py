"""Bucketed tables: pre-shuffled storage so big-with-big joins and
repeated aggregations on the bucket key run WITHOUT an Exchange.

At 100TB the dominant cost of orders ⋈ customer (both huge, neither
broadcastable) is shuffling both sides on the key for every query. Writing
each table bucketed on its join key pays that shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions rows into n files per partition, and
Catalyst recognizes two tables bucketed on the join key with the same
bucket count as co-partitioned — the SortMergeJoin reads buckets
pairwise, no Exchange on either side (verified by plan assertion in
tests/test_bucketing.py). The same layout removes the shuffle from any
groupBy on the bucket key.

Requires a catalog table (``saveAsTable``) — bucket metadata lives in the
catalog, not in parquet itself. Plain ``.parquet(path)`` writes cannot
carry it; the test environment uses the default in-memory catalog with a
temp warehouse.

Sizing: pick n_buckets so each bucket file lands near the 128-256MB
parquet sweet spot at production scale (e.g. 100TB / 256MB ≈ 400k rows of
buckets across partitions — in practice combine with a date partition
column and ~1-4k buckets). Too few buckets -> giant tasks; too many ->
small-file explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_key: str,
                   n_buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Materialize ``df`` as a catalog table bucketed (and by default
    sorted) on ``bucket_key``. Sorting within buckets lets SortMergeJoin
    skip its per-task sort too."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str,
                  how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With the
    layouts from write_bucketed this plans a zero-Exchange SortMergeJoin."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)
