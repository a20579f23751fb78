"""Snapshot diff: compare two versions of a keyed table and classify
every key as added / removed / changed / unchanged — the audit operator
behind incremental-load validation ("what did this backfill actually
touch?") and slowly-changing-dimension detection. Nothing like it exists
in the reference (its idempotency story is truncate-and-reload).

Scale notes: one full outer join on the key — both sides shuffle once on
the same key (or zero shuffles if both snapshots were written bucketed
by the key, sources/bucketing.py). Change detection compares a single
fingerprint column computed BEFORE the join, so the join carries (key,
hash) pairs, not full rows; at 100TB that is the difference between
shuffling kilobyte rows and shuffling 16 bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  compare_cols: list[str] | None = None) -> DataFrame:
    """(key, status) for every key in either snapshot, status in
    {'added', 'removed', 'changed', 'unchanged'}. ``compare_cols``
    defaults to all non-key columns common to both sides (sorted, so the
    fingerprint is column-order independent)."""
    cols = compare_cols or sorted(
        (set(old.columns) & set(new.columns)) - {key})

    def fp(df: DataFrame) -> DataFrame:
        # md5 over a '|'-delimited canonical projection; NULL is encoded
        # distinctly from the string 'null' via a sentinel
        parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
        return df.select(F.col(key),
                         F.md5(F.concat_ws("|", *parts)).alias("fp"))

    o = fp(old).withColumnRenamed("fp", "fp_old")
    n = fp(new).withColumnRenamed("fp", "fp_new")
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") != F.col("fp_new"), "changed")
        .otherwise("unchanged")
    )
    return j.select(F.col(key), status.alias("status"))


def diff_summary(old: DataFrame, new: DataFrame, key: str,
                 compare_cols: list[str] | None = None) -> DataFrame:
    """Aggregate counts per diff status."""
    return (
        snapshot_diff(old, new, key, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
