"""Lineitem fact-table analytics — the engine's BIG-fact path. Every
other batch query reads orders (the mid-size fact); these three exercise
the largest table and the join shapes that dominate a 100 TB warehouse:

- q11: full-scan aggregation over bounded keys (TPC-H Q1 shape) — the
  canonical partial-aggregate benchmark; all money math in exact
  integers so partial-agg order can't perturb results.
- q12: lineitem ⋈ orders — a genuinely BIG-to-BIG join (neither side
  broadcastable at scale). Catalyst picks sort-merge on the shuffled
  orderkey; with both tables bucketed by orderkey (sources/bucketing.py)
  the same plan runs shuffle-free. The filter on l_shipdate pushes to
  the parquet scan.
- q13: two-level re-aggregation to a supplier top-k, dimension join
  broadcast AFTER the heavy aggregation (join the 10 survivors, not the
  600M-row fact).

Integer-unit discipline (see plans/base.py): extendedprice -> cents
(1e-2), discount/tax -> integer percent (1e-2); products are exact
integers in 1e-4 / 1e-6 dollar units. At SF100k+ the 1e-6-unit sums
approach int64 range — on a cluster use DECIMAL(38, 6) there; the shape
is otherwise unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from asvsp_spark.plans.base import money_cents, round_fixed


def _pct(col: F.Column) -> F.Column:
    """2-decimal fraction (0.05) -> exact integer percent (5)."""
    return F.round(col * 100, 0).cast("long")


def q11_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary over
    lines shipped up to 2001-09-01. One scan, partial aggregation onto
    ~6 groups; the shipdate filter reaches the parquet scan."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
    cents = money_cents(F.col("l_extendedprice"))
    disc = _pct(F.col("l_discount"))
    tax = _pct(F.col("l_tax"))
    qty = F.col("l_quantity").cast("long")
    agg = (
        li.select(
            "l_returnflag", "l_linestatus",
            qty.alias("qty"),
            cents.alias("cents"),
            (cents * (100 - disc)).alias("disc_e4"),
            (cents * (100 - disc) * (100 + tax)).alias("charge_e6"),
            disc.alias("disc_pct"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("qty").alias("sum_qty"),
             F.sum("cents").alias("base_cents"),
             F.sum("disc_e4").alias("disc_e4"),
             F.sum("charge_e6").alias("charge_e6"),
             F.sum("disc_pct").alias("disc_pct_sum"),
             F.count(F.lit(1)).alias("count_order"))
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag", "l_linestatus", "sum_qty",
        (F.col("base_cents") / 100.0).alias("sum_base_price"),
        (F.col("disc_e4") / 10000.0).alias("sum_disc_price"),
        (F.col("charge_e6") / 1000000.0).alias("sum_charge"),
        round_fixed(F.col("sum_qty") / n, 4).alias("avg_qty"),
        round_fixed(F.col("base_cents") / n / 100.0, 4).alias("avg_price"),
        round_fixed(F.col("disc_pct_sum") / n / 100.0, 6).alias("avg_disc"),
        "count_order")


def q12_late_shipments(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Late-shipment audit per (ship year, order priority): lines shipped
    more than 90 days after their order date. lineitem ⋈ orders is the
    big-to-big join — at 100 TB neither side broadcasts, so the plan is
    a shuffle on l_orderkey/o_orderkey into sort-merge; bucketing both
    tables by orderkey (sources/bucketing.py bucketed_join) removes the
    shuffle entirely. Projections are pruned to 3+3 columns before the
    join, so the shuffle carries keys + dates, not full rows."""
    li = lineitem.select("l_orderkey", "l_shipdate",
                         money_cents(F.col("l_extendedprice")).alias("cents"))
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    late = j.filter(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
    return (
        late.groupBy(F.year("l_shipdate").alias("ship_yr"),
                     F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_late_lines"),
             (F.sum("cents") / 100.0).alias("late_revenue"))
    )


def q13_supplier_margin_topk(lineitem: DataFrame, supplier: DataFrame,
                             nation: DataFrame, top_k: int = 10) -> DataFrame:
    """Top-k suppliers by discounted revenue: heavy aggregation FIRST
    (600M rows -> n_suppliers), THEN the broadcast dimension join on the
    k survivors — never join names onto the raw fact. TakeOrdered top-k,
    rank over the k-row frame."""
    cents = money_cents(F.col("l_extendedprice"))
    disc = _pct(F.col("l_discount"))
    rev = (
        lineitem
        .select("l_suppkey", (cents * (100 - disc)).alias("disc_e4"))
        .groupBy("l_suppkey")
        .agg(F.sum("disc_e4").alias("rev_e4"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy(F.desc("rev_e4"), F.asc_nulls_last("l_suppkey"))
        .limit(top_k)
    )
    named = (
        rev.join(F.broadcast(supplier),
                 rev.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation),
              supplier.s_nationkey == nation.n_nationkey)
    )
    w = Window.orderBy(F.desc("rev_e4"), F.asc_nulls_last("l_suppkey"))
    return (
        named.withColumn("rk", F.row_number().over(w))
        .select("rk", F.col("l_suppkey").alias("suppkey"),
                F.col("s_name").alias("supplier"),
                F.col("n_name").alias("nation"),
                (F.col("rev_e4") / 10000.0).alias("revenue"),
                "n_lines")
    )
