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


def test_cbo_stats_reorder_joins(spark, tmp_path):
    """CBO end-to-end: with ANALYZE stats in the catalog and
    cbo.joinReorder on, a 3-table inner join WRITTEN in a bad order
    (fact x wide-dim first) is re-ordered so the most selective
    dimension joins first — asserted on the optimized logical plan,
    which differs from the stats-free plan. This is the 100 TB payoff
    analyze_table's docstring claims: join ORDER is fixed before the
    first shuffle, where AQE cannot reach."""
    from asvsp_spark.sources.catalog import (analyze_table, disable_cbo,
                                             enable_cbo,
                                             register_parquet_table)
    fact_p, dm_p, ds_p = (str(tmp_path / n) for n in ("f", "dm", "ds"))
    spark.range(20000).selectExpr(
        "id", "id % 1000 AS k_med", "id % 1000 AS k_sel""").write.parquet(fact_p)
    # wide dim: matches every fact row (selectivity 1.0)
    spark.range(1000).selectExpr(
        "id AS k_med", "id * 2 AS med_payload").write.parquet(dm_p)
    # selective dim: matches 1% of fact rows
    spark.range(10).selectExpr(
        "id AS k_sel", "id * 3 AS sel_payload").write.parquet(ds_p)
    for name, p in (("cbo_fact", fact_p), ("cbo_dmed", dm_p),
                    ("cbo_dsel", ds_p)):
        register_parquet_table(spark, name, p, replace=True)
    try:
        for name, cols in (("cbo_fact", ("k_med", "k_sel")),
                           ("cbo_dmed", ("k_med",)),
                           ("cbo_dsel", ("k_sel",))):
            analyze_table(spark, name, columns=cols)
        sql = """
            SELECT sum(f.id + d1.med_payload + d2.sel_payload) AS s
            FROM cbo_fact f
            JOIN cbo_dmed d1 ON f.k_med = d1.k_med
            JOIN cbo_dsel d2 ON f.k_sel = d2.k_sel
        """

        def join_order(plan: str) -> list[str]:
            import re
            return re.findall(r"cbo_(dmed|dsel)", plan)

        disable_cbo(spark)
        base = spark.sql(sql)
        base_plan = base._jdf.queryExecution().optimizedPlan().toString()
        enable_cbo(spark)
        cbo = spark.sql(sql)
        cbo_plan = cbo._jdf.queryExecution().optimizedPlan().toString()

        # without stats-based reorder the join tree follows the SQL
        # (dmed joined below dsel); with CBO the selective dim moves
        # into the innermost join — the orders must differ, and the
        # CBO plan must join dsel before dmed
        assert join_order(base_plan) != join_order(cbo_plan), cbo_plan
        # left-deep plan text lists the innermost join's scans first:
        # the selective dim must now sit in the innermost join
        assert join_order(cbo_plan)[0] == "dsel", cbo_plan
        # same answer either way
        assert base.collect() == cbo.collect()
    finally:
        disable_cbo(spark)
        for name in ("cbo_fact", "cbo_dmed", "cbo_dsel"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
