"""Catalog registration (SURVEY §2.1 S4): CREATE TABLE USING PARQUET over
an existing directory + recoverPartitions as the MSCK REPAIR analogue.
Covers the reference's load_hourly.py DDL/repair cycle: register once,
append a partition directory out-of-band, repair, see the new rows."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from asvsp_spark.sources.catalog import register_parquet_table, repair_table


@pytest.fixture
def part_dir(spark):
    d = tempfile.mkdtemp(prefix="cattest-")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-01"),
         (3, "c", "2024-01-02")],
        "id long, payload string, dt string")
    df.write.partitionBy("dt").mode("overwrite").parquet(d)
    return d


def test_register_partitioned_table(spark, part_dir):
    t = register_parquet_table(spark, "cat_events", part_dir,
                               partition_cols=("dt",), replace=True)
    try:
        assert t.count() == 3
        assert set(t.columns) == {"id", "payload", "dt"}
        # partition pruning: only the matching directory is listed
        one_day = spark.table("cat_events").filter(F.col("dt") == "2024-01-01")
        assert one_day.count() == 2
        plan = one_day.queryExecution.executedPlan().toString() if False else \
            one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan or "dt" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_events")


def test_repair_discovers_out_of_band_partition(spark, part_dir):
    register_parquet_table(spark, "cat_events2", part_dir,
                           partition_cols=("dt",), replace=True)
    try:
        assert spark.table("cat_events2").count() == 3
        # a landing job appends a partition directory behind the catalog's
        # back — invisible until repair, visible after (MSCK semantics)
        extra = spark.createDataFrame(
            [(4, "d", "2024-01-03")], "id long, payload string, dt string")
        extra.write.partitionBy("dt").mode("append").parquet(part_dir)
        repair_table(spark, "cat_events2")
        assert spark.table("cat_events2").count() == 4
        assert (spark.table("cat_events2")
                .filter(F.col("dt") == "2024-01-03").count() == 1)
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_events2")


def test_register_unpartitioned_and_missing_partition_col(spark):
    d = tempfile.mkdtemp(prefix="cattest-flat-")
    spark.createDataFrame([(1, "x")], "id long, v string") \
        .write.mode("overwrite").parquet(d)
    t = register_parquet_table(spark, "cat_flat", d, replace=True)
    try:
        assert t.count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_flat")
    with pytest.raises(ValueError, match="partition columns"):
        register_parquet_table(spark, "cat_bad", d,
                               partition_cols=("nope",), replace=True)


def test_analyze_table_lands_statistics(spark, tmp_path):
    """ANALYZE writes row-count/size stats into the catalog entry (the
    CBO's planning input) and column stats are accepted."""
    from asvsp_spark.sources.catalog import analyze_table, register_parquet_table
    path = str(tmp_path / "t")
    spark.range(123).selectExpr("id", "id % 7 AS grp") \
        .write.parquet(path)
    register_parquet_table(spark, "stats_t", path, replace=True)
    stats = analyze_table(spark, "stats_t", columns=("grp",))
    assert "Statistics" in stats
    assert "123 rows" in stats["Statistics"]
    spark.sql("DROP TABLE IF EXISTS stats_t")
