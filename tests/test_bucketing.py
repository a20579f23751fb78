"""Bucketed co-located join: the plan must contain NO Exchange on either
side (the write-time bucketing replaced the per-query shuffle), and the
join result must equal the plain join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from asvsp_spark import tables
from asvsp_spark.sources.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture()
def warehouse(spark, tmp_path):
    # warehouse.dir is a static conf — point a database at the temp dir
    spark.sql(f"CREATE DATABASE bucketdb LOCATION '{tmp_path / 'wh'}'")
    spark.sql("USE bucketdb")
    yield spark
    spark.sql("USE default")
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    orders = tables.load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    customer = tables.load(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey")
    write_bucketed(orders, "b_orders", "o_custkey", 4)
    write_bucketed(customer, "b_customer", "c_custkey", 4)

    # broadcast would dodge the point — force the sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "b_orders", "b_customer",
                          "o_custkey", "c_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        expect = orders.join(
            customer, orders.o_custkey == customer.c_custkey).count()
        assert j.count() == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
