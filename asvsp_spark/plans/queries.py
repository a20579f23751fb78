"""The ten batch analytic queries (SURVEY §2.10), re-expressed over the
driver's TPC-H-ish tables.

Each reproduces the operator shape of the reference query it is named for
(rank-with-lag, peak-month re-aggregation, cumulative running sums,
MoM/YoY lags, dual asc/desc ranking, ROWS-frame moving averages, NTILE
quartiles, period-over-period joins, conditional weekend averages,
gaps-and-islands streaks) — citations to the reference SQL in each
docstring. All are pure transforms: (facts...) -> DataFrame.

Determinism contract: every window ORDER BY carries a unique tiebreaker
column, every LIMIT follows a total ORDER BY, and every floating aggregate
is rounded at its production site — so results are set-identical across
engines and runs (the oracle harness hash-compares).

Scale notes: all windows partition by (nation | priority) — bounded
cardinality, so window state per partition is small and Spark plans a
single shuffle per window spec that AQE can coalesce. No window is
partitioned by an unbounded key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from asvsp_spark.plans.base import (
    MONEY_SCALE,
    RATE_SCALE,
    avg_dollars,
    cents_to_dollars,
    daily_priority_revenue,
    money_cents,
    monthly_nation_revenue,
    round_fixed,
    yearly_nation_revenue,
)


def q01_yearly_rank_yoy(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Top-10 nations by revenue per year, with rank change vs prior year.

    Mirrors reference q01_state_ranking_yoy.sql:2-33 (RANK per year, LAG of
    rank per state, NVL, rank<=10 filter).
    """
    yearly = yearly_nation_revenue(orders, customer, nation)
    w_rank = Window.partitionBy("yr").orderBy(F.desc("revenue"), F.asc_nulls_last("nation"))
    w_lag = Window.partitionBy("nation").orderBy(F.asc_nulls_last("yr"))
    return (
        yearly
        .withColumn("rnk", F.rank().over(w_rank))
        .withColumn("prev_rnk", F.lag("rnk").over(w_lag))
        .withColumn("rank_change", F.coalesce(F.col("prev_rnk") - F.col("rnk"), F.lit(0)))
        .filter(F.col("rnk") <= 10)
        .select("nation", "yr", "revenue", "rnk", "rank_change")
    )


def q02_peak_month(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Peak revenue month per (nation, year) + the nation's most frequent
    peak month across all years.

    Mirrors reference q02_peak_month.sql:2-40 (RANK per (state,year),
    re-aggregated COUNT, RANK over COUNT, inner join with freq_rank=1
    predicate).
    """
    monthly = monthly_nation_revenue(orders, customer, nation)
    w_peak = Window.partitionBy("nation", "yr").orderBy(F.desc("revenue"), F.asc_nulls_last("mon"))
    peaks = (
        monthly
        .withColumn("rn", F.rank().over(w_peak))
        .filter(F.col("rn") == 1)
        .select("nation", "yr", F.col("mon").alias("peak_month"),
                F.col("revenue").alias("peak_revenue"))
    )
    w_freq = Window.partitionBy("nation").orderBy(F.desc("n_years"), F.asc_nulls_last("peak_month"))
    freq = (
        peaks.groupBy("nation", "peak_month")
        .agg(F.count(F.lit(1)).alias("n_years"))
        .withColumn("freq_rank", F.rank().over(w_freq))
        .filter(F.col("freq_rank") == 1)
        .select("nation", F.col("peak_month").alias("most_frequent_peak_month"),
                F.col("n_years").alias("peak_month_frequency"))
    )
    # freq is <= a few rows per nation (rank-1 ties) at ANY data scale —
    # broadcast keeps the peaks side shuffle-free
    return peaks.join(F.broadcast(freq), "nation", "inner").select(
        "nation", "yr", "peak_month", "peak_revenue",
        "most_frequent_peak_month", "peak_month_frequency",
    )


def q03_cumulative_top10(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                         price_threshold: float = 400_000.0) -> DataFrame:
    """Top-10 nations by cumulative count of high-value orders, with the
    full yearly trace for each.

    Mirrors reference q03_cumulative_exceedances.sql:2-24 (running SUM,
    MAX per state, LIMIT 10 subquery, join back to yearly rows). NAAQS
    exceedance -> order value above threshold.
    """
    from asvsp_spark.plans.base import nation_orders
    yearly = (
        nation_orders(orders, customer, nation)
        .filter(F.col("o_totalprice") > price_threshold)
        .groupBy("nation", F.year("o_orderdate").alias("yr"))
        .agg(F.count(F.lit(1)).alias("high_value_orders"))
    )
    w_cum = (
        Window.partitionBy("nation").orderBy(F.asc_nulls_last("yr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    traced = yearly.withColumn(
        "cumulative_high_value_orders", F.sum("high_value_orders").over(w_cum))
    totals = (
        traced.groupBy("nation")
        .agg(F.max("cumulative_high_value_orders").alias("total_high_value_orders"))
        .orderBy(F.desc("total_high_value_orders"), F.asc_nulls_last("nation"))
        .limit(10)
    )
    return traced.join(F.broadcast(totals), "nation", "inner").select(
        "nation", "yr", "high_value_orders",
        "cumulative_high_value_orders", "total_high_value_orders",
    )


def q04_mom_pct_change(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Month-over-month % revenue change per nation.

    Mirrors reference q04_month_over_month.sql:2-11 over the monthly
    rollup's LAG columns (monthly_aggregation.py:39-47).
    """
    monthly = monthly_nation_revenue(orders, customer, nation)
    w = Window.partitionBy("nation").orderBy(F.asc_nulls_last("yr"), F.asc_nulls_last("mon"))
    return (
        monthly
        .withColumn("prev_month_revenue", F.lag("revenue").over(w))
        .withColumn(
            "mom_pct_change",
            round_fixed(F.try_divide(
                F.col("revenue") - F.col("prev_month_revenue"),
                F.col("prev_month_revenue")) * 100.0, MONEY_SCALE))
        .select("nation", "yr", "mon", "revenue", "prev_month_revenue", "mom_pct_change")
    )


def q05_same_month_yoy(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Top-10 improving and worsening nations by average same-month YoY
    revenue change, labeled.

    Mirrors reference q05_same_month_yoy.sql:2-40 (NOT NULL filter, AVG
    per state, dual RANK asc/desc, CASE label).
    """
    monthly = monthly_nation_revenue(orders, customer, nation)
    w_yoy = Window.partitionBy("nation", "mon").orderBy(F.asc_nulls_last("yr"))
    changes = (
        monthly
        .withColumn("prev_year_cents", F.lag("revenue_cents").over(w_yoy))
        .filter(F.col("prev_year_cents").isNotNull())
        .withColumn("yoy_change_cents", F.col("revenue_cents") - F.col("prev_year_cents"))
    )
    avg_change = changes.groupBy("nation").agg(
        avg_dollars(F.sum("yoy_change_cents"), F.count(F.lit(1))).alias("avg_yoy_change"))
    w_best = Window.orderBy(F.asc_nulls_last("avg_yoy_change"), F.asc_nulls_last("nation"))
    w_worst = Window.orderBy(F.desc("avg_yoy_change"), F.asc_nulls_last("nation"))
    return (
        avg_change
        .withColumn("rank_declining", F.rank().over(w_best))
        .withColumn("rank_growing", F.rank().over(w_worst))
        .filter((F.col("rank_declining") <= 10) | (F.col("rank_growing") <= 10))
        .withColumn("trend", F.when(F.col("rank_growing") <= 10, F.lit("growing"))
                      .otherwise(F.lit("declining")))
        .select("nation", "avg_yoy_change", "rank_declining", "rank_growing", "trend")
    )


def q06_moving_average(orders: DataFrame) -> DataFrame:
    """Date of the highest 30-day moving average of daily revenue per
    (priority, year).

    Mirrors reference q06_moving_average.sql:2-37. Deliberately a ROWS
    frame (29 PRECEDING), not a RANGE/time frame: gaps in days shrink the
    real time span — the reference's exact (and load-bearing) semantics
    (SURVEY W6).
    """
    daily = daily_priority_revenue(orders)
    w_mov = (
        Window.partitionBy("prio").orderBy(F.asc_nulls_last("day")).rowsBetween(-29, 0)
    )
    w_rank = Window.partitionBy("prio", "yr").orderBy(
        F.desc("moving_avg_30d"), F.asc_nulls_last("day"))
    return (
        daily
        .withColumn("moving_avg_30d",
                    avg_dollars(F.sum("revenue_cents").over(w_mov),
                                F.count(F.lit(1)).over(w_mov)))
        .withColumn("yr", F.year("day"))
        .withColumn("rn", F.rank().over(w_rank))
        .filter(F.col("rn") == 1)
        .select("prio", "yr", F.date_format("day", "yyyy-MM-dd").alias("peak_day"),
                "moving_avg_30d")
    )


def q07_ntile_quartiles(orders: DataFrame) -> DataFrame:
    """Quartile classification of daily revenue.

    Mirrors reference q07_percentile_classification.sql:2-25. NTILE(4)
    partitions by priority ONLY (across all years) while the output groups
    by (priority, year) — the reference's subtle-but-load-bearing
    partitioning (SURVEY W7).
    """
    daily = daily_priority_revenue(orders)
    w_ntile = Window.partitionBy("prio").orderBy(F.desc("revenue"), F.asc_nulls_last("day"))
    return (
        daily
        .withColumn("quartile", F.ntile(4).over(w_ntile))
        .withColumn("yr", F.year("day"))
        .groupBy("prio", "yr", "quartile")
        .agg(F.count(F.lit(1)).alias("n_days"),
             avg_dollars(F.sum("revenue_cents"), F.count(F.lit(1)))
             .alias("quartile_avg_revenue"))
        .withColumn("quartile_label",
                    F.when(F.col("quartile") == 1, "peak")
                     .when(F.col("quartile") == 2, "high")
                     .when(F.col("quartile") == 3, "moderate")
                     .otherwise("low"))
    )


def q08_period_compare(orders: DataFrame, customer: DataFrame, nation: DataFrame,
                       base_year: int = 1995, comp_year: int = 1996,
                       months: tuple[int, ...] = (3, 4, 5)) -> DataFrame:
    """Revenue change between the same months of two years, top-15 drops.

    Mirrors reference q08_covid_impact.sql:2-39 (two filtered aggregates,
    inner join on state, pct formula, RANK, LIMIT 15).
    """
    from asvsp_spark.plans.base import nation_orders
    no = nation_orders(orders, customer, nation).withColumn(
        "yr", F.year("o_orderdate")).withColumn("mon", F.month("o_orderdate"))
    in_months = F.col("mon").isin(list(months))

    def period(year: int, alias: str) -> DataFrame:
        return (
            no.filter((F.col("yr") == year) & in_months)
            .groupBy("nation")
            .agg(cents_to_dollars(F.sum("o_cents")).alias(alias))
        )

    base = period(base_year, "base_revenue")
    comp = period(comp_year, "comp_revenue")
    w = Window.orderBy(F.asc_nulls_last("pct_change"), F.asc_nulls_last("nation"))
    return (
        # both sides aggregate to |nations| rows — broadcast dodges the
        # sort-merge shuffle Catalyst's static size estimate would pick
        base.join(F.broadcast(comp), "nation", "inner")
        .withColumn("pct_change",
                    round_fixed(F.try_divide(
                        F.col("comp_revenue") - F.col("base_revenue"),
                        F.col("base_revenue")) * 100.0, MONEY_SCALE))
        .withColumn("drop_rank", F.rank().over(w))
        .filter(F.col("drop_rank") <= 15)
        .select("nation", "base_revenue", "comp_revenue", "pct_change", "drop_rank")
    )


def q09_weekend_effect(orders: DataFrame) -> DataFrame:
    """Weekend-vs-weekday average daily revenue ratio per priority,
    with dual ranking and trend label.

    Mirrors reference q09_weekend_effect.sql:2-32 (conditional AVGs —
    NULLs excluded, ratio, dual RANK, CASE). Weekend = Spark
    dayofweek IN (1,7), i.e. Sun/Sat (reference daily_aggregation.py:25-26).
    """
    daily = daily_priority_revenue(orders).withColumn(
        "is_weekend", F.dayofweek("day").isin(1, 7))
    agg = daily.groupBy("prio").agg(
        avg_dollars(F.sum(F.when(F.col("is_weekend"), F.col("revenue_cents"))),
                    F.count(F.when(F.col("is_weekend"), F.col("revenue_cents"))))
        .alias("weekend_avg"),
        avg_dollars(F.sum(F.when(~F.col("is_weekend"), F.col("revenue_cents"))),
                    F.count(F.when(~F.col("is_weekend"), F.col("revenue_cents"))))
        .alias("weekday_avg"),
    ).withColumn("weekend_ratio",
                 round_fixed(F.try_divide(F.col("weekend_avg"),
                                          F.col("weekday_avg")), RATE_SCALE))
    w_low = Window.orderBy(F.asc_nulls_last("weekend_ratio"), F.asc_nulls_last("prio"))
    w_high = Window.orderBy(F.desc("weekend_ratio"), F.asc_nulls_last("prio"))
    return (
        agg
        .withColumn("rank_lowest", F.rank().over(w_low))
        .withColumn("rank_highest", F.rank().over(w_high))
        .withColumn("weekend_effect",
                    F.when(F.col("weekend_ratio") > 1.0, "weekend_heavy")
                     .when(F.col("weekend_ratio") < 1.0, "weekday_heavy")
                     .otherwise("neutral"))
    )


def q10_improvement_streaks(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Longest consecutive-months-declining revenue streak per nation,
    top-15.

    Mirrors reference q10_consecutive_improvement.sql:2-53: LAG,
    gaps-and-islands via conditional running SUM, two-level
    re-aggregation, LIMIT 15 (SURVEY W12/A8). "Improvement" for pollution
    = value going down; kept as declining revenue here.
    """
    monthly = monthly_nation_revenue(orders, customer, nation)
    w_seq = Window.partitionBy("nation").orderBy(F.asc_nulls_last("yr"), F.asc_nulls_last("mon"))
    w_grp = (
        Window.partitionBy("nation").orderBy(F.asc_nulls_last("yr"), F.asc_nulls_last("mon"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        monthly
        .withColumn("prev_revenue", F.lag("revenue").over(w_seq))
        .withColumn("declining",
                    F.col("prev_revenue").isNotNull()
                    & (F.col("revenue") < F.col("prev_revenue")))
        .withColumn("break_flag", F.when(F.col("declining"), F.lit(0)).otherwise(F.lit(1)))
        .withColumn("grp", F.sum("break_flag").over(w_grp))
    )
    streaks = (
        flagged.filter(F.col("declining"))
        .groupBy("nation", "grp")
        .agg(F.count(F.lit(1)).alias("streak_len"),
             F.min(F.col("yr") * 100 + F.col("mon")).alias("streak_start"),
             F.max(F.col("yr") * 100 + F.col("mon")).alias("streak_end"))
    )
    best = (
        streaks.groupBy("nation")
        .agg(F.max("streak_len").alias("longest_streak"))
    )
    w_top = Window.orderBy(F.desc("longest_streak"), F.asc_nulls_last("nation"))
    top = (
        best.withColumn("rnk", F.rank().over(w_top))
        .filter(F.col("rnk") <= 15)
    )
    # join back the earliest streak achieving the max, deterministically;
    # top is <= 15 rows by construction — broadcast at any scale
    detail = (
        streaks.join(F.broadcast(top.select("nation", "longest_streak", "rnk")),
                     "nation")
        .filter(F.col("streak_len") == F.col("longest_streak"))
        .groupBy("nation", "longest_streak", "rnk")
        .agg(F.min("streak_start").alias("streak_start"))
    )
    return detail.select("nation", "longest_streak", "streak_start", "rnk")
