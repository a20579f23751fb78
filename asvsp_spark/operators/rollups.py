"""Layered rollup hierarchy: hourly events -> daily -> monthly, plus
annual-with-cumulative on the orders fact and statistical baselines.

Mirrors the reference's warehouse layering (SURVEY §1.1, §2.4):
daily_aggregation.py:19-28 (A1), monthly_aggregation.py:21-53 (A2 + W8/W9),
annual_aggregation.py:20-44 (A3 + W10/W11), baselines.py:21-32 (A4).
The reference materializes each layer to partitioned parquet; these are the
pure transforms — `asvsp_spark.sources.batch.write_partitioned` handles the
layout (daily: partition by (event_type, year, month); baselines: by
event_type) so partition pruning works for downstream readers.

Determinism: `value` is quantized to integer centi-units at the scan, all
sums (and sums of squares, for stddev) are exact integers, and averages
round once in integer space — bit-identical across engines and shuffle
orders (see plans/base.py for the full rationale).

Scale notes: group keys are (event_type, time-bucket) — bounded
cardinality — so partial aggregation collapses the fact before the
shuffle; at 100TB the daily layer is ~|types| x |days| rows regardless of
input size. The weekend/hour columns derive from the timestamp inside the
same projection, adding no extra pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from asvsp_spark.plans.base import round_fixed

VALUE_SCALE = 100  # centi-units: value has ~2 significant decimals
# Threshold for "exceedance" days, the NAAQS analogue
# (reference monthly_aggregation.py:21-30): events daily averages center
# near 50, so 50.0 splits meaningfully.
EXCEEDANCE_THRESHOLD = 50.0


def value_centi(col: Column) -> Column:
    return F.round(col * VALUE_SCALE, 0).cast("long")


def centi_avg(centi_sum: Column, n: Column) -> Column:
    """Integer-space rounded average: identical doubles in every engine.

    Zero-guard: under ANSI mode (Spark 4 default) a bare x/0 ABORTS the
    whole job — one degenerate group must not kill a corpus-scale
    rollup. DuckDB yields NULL for x/0; the guard makes both engines
    return NULL (r10 NULL-ts edge probe).
    """
    return F.when(
        n > 0, F.round(centi_sum / n, 0).cast("long") / float(VALUE_SCALE))


def daily_rollup(events: DataFrame) -> DataFrame:
    """(event_type, day) -> avg/max/count + weekend flags.

    Reference A1 (daily_aggregation.py:19-28); weekend = Spark
    dayofweek IN (1,7) i.e. Sun/Sat (daily_aggregation.py:25-26).
    """
    return (
        events
        .select(
            F.col("event_type"),
            F.to_date("ts").alias("day"),
            value_centi(F.col("value")).alias("v_centi"),
            F.col("value"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum("v_centi").alias("v_centi_sum"),
            F.count("value").alias("n_events"),
            F.max("value").alias("daily_max"),
        )
        .withColumn("daily_avg", centi_avg(F.col("v_centi_sum"), F.col("n_events")))
        .withColumn("day_of_week", F.dayofweek("day"))
        .withColumn("is_weekend", F.col("day_of_week").isin(1, 7))
        .withColumn("yr", F.year("day"))
        .withColumn("mon", F.month("day"))
    )


def monthly_rollup(daily: DataFrame,
                   threshold: float = EXCEEDANCE_THRESHOLD) -> DataFrame:
    """(event_type, yr, mon) -> avg-of-daily-avgs (unweighted — the
    reference's deliberate average-of-averages, SURVEY §1.4.6), max,
    day count, exceedance days, MoM and same-month-YoY lag columns.

    Reference A2+W8+W9 (monthly_aggregation.py:21-53).
    """
    from pyspark.sql import Window
    monthly = (
        daily
        .withColumn("davg_centi", value_centi(F.col("daily_avg")))
        .groupBy("event_type", "yr", "mon")
        .agg(
            F.sum("davg_centi").alias("davg_centi_sum"),
            # rows, not non-null days: after daily_rollup each row IS a
            # day (a NULL-day group still contributed one daily row, and
            # the oracle counts it — count("day") read 0 there and the
            # downstream division aborted under ANSI; r10 edge probe)
            F.count(F.lit(1)).alias("days_with_data"),
            F.max("daily_max").alias("monthly_max"),
            F.sum(F.when(F.col("daily_avg") > threshold, 1).otherwise(0))
             .alias("exceedance_days"),
        )
        .withColumn("monthly_avg",
                    centi_avg(F.col("davg_centi_sum"), F.col("days_with_data")))
    )
    w_mom = Window.partitionBy("event_type").orderBy(F.asc_nulls_last("yr"), F.asc_nulls_last("mon"))
    w_yoy = Window.partitionBy("event_type", "mon").orderBy(F.asc_nulls_last("yr"))
    return (
        monthly
        .withColumn("prev_month_avg", F.lag("monthly_avg").over(w_mom))
        .withColumn("mom_pct_change",
                    round_fixed(F.try_divide(
                        F.col("monthly_avg") - F.col("prev_month_avg"),
                        F.col("prev_month_avg")) * 100.0, 2))
        .withColumn("same_month_prev_year_avg", F.lag("monthly_avg").over(w_yoy))
        .withColumn("yoy_month_change",
                    round_fixed(F.col("monthly_avg") - F.col("same_month_prev_year_avg"), 4))
    )


def baselines(events: DataFrame) -> DataFrame:
    """(event_type, month, hour, is_weekend) -> baseline avg + stddev.

    Reference A4 (baselines.py:21-32) — the static side of every
    stream-static join (SQ1/SQ4/SQ5). Sample stddev computed from exact
    integer sums (n, S1, S2) so the result is engine- and
    shuffle-order-independent; NULL when n == 1, matching stddev_samp.
    """
    keyed = events.select(
        F.col("event_type"),
        F.month("ts").alias("mon"),
        F.hour("ts").alias("hr"),
        F.dayofweek(F.to_date("ts")).isin(1, 7).alias("is_weekend"),
        value_centi(F.col("value")).alias("v"),
    )
    agg = keyed.groupBy("event_type", "mon", "hr", "is_weekend").agg(
        F.count("v").alias("n_obs"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    n, s1, s2 = F.col("n_obs"), F.col("s1"), F.col("s2")
    variance_centi = (s2 - s1 * s1 / n) / (n - 1)
    return (
        agg
        .withColumn("baseline_avg", centi_avg(s1, n))
        .withColumn(
            "baseline_stddev",
            F.when(n > 1,
                   round_fixed(F.sqrt(F.greatest(F.lit(0.0), variance_centi))
                               / VALUE_SCALE, 4))
            .otherwise(F.lit(None).cast("double")))
        .select("event_type", "mon", "hr", "is_weekend",
                "n_obs", "baseline_avg", "baseline_stddev")
    )


def annual_nation_rollup(yearly_revenue: DataFrame) -> DataFrame:
    """(nation, yr) -> revenue + YoY lag/pct + cumulative running sum.

    Reference A3+W10+W11 (annual_aggregation.py:20-44): LAG per group and
    an unbounded-preceding running SUM. Takes the yearly_nation_revenue
    conformed fact (plans/base.py).
    """
    from pyspark.sql import Window
    w_lag = Window.partitionBy("nation").orderBy(F.asc_nulls_last("yr"))
    w_cum = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        yearly_revenue
        .withColumn("prev_year_revenue", F.lag("revenue").over(w_lag))
        .withColumn("yoy_pct_change",
                    round_fixed(F.try_divide(
                        F.col("revenue") - F.col("prev_year_revenue"),
                        F.col("prev_year_revenue")) * 100.0, 2))
        .withColumn("cumulative_revenue",
                    F.sum("revenue_cents").over(w_cum) / 100.0)
        .select("nation", "yr", "revenue", "prev_year_revenue",
                "yoy_pct_change", "cumulative_revenue")
    )
