"""Registry: query name -> (spark, sf_dir) -> DataFrame, plus oracle SQL.

This is the single source of truth consumed by __spark_entry__.py, bench.py
and the oracle tests. Add every new operator here with an oracle entry
(or deliberately without one, for non-SQL-expressible ops — the driver then
records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from asvsp_spark import tables
from asvsp_spark.operators import rollups as R
from asvsp_spark.plans import queries as Q
from asvsp_spark.plans.base import yearly_nation_revenue
from asvsp_spark.plans.oracle import ORACLE
from asvsp_spark.plans.oracle_rollups import ORACLE_ROLLUPS

ORACLE.update(ORACLE_ROLLUPS)

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}


def register(name: str):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load(spark, sf_dir, name)


@register("q01_yearly_rank_yoy")
def _q01(spark, sf):
    return Q.q01_yearly_rank_yoy(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                                 _t(spark, sf, "nation"))


@register("q02_peak_month")
def _q02(spark, sf):
    return Q.q02_peak_month(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                            _t(spark, sf, "nation"))


@register("q03_cumulative_top10")
def _q03(spark, sf):
    return Q.q03_cumulative_top10(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                                  _t(spark, sf, "nation"))


@register("q04_mom_pct_change")
def _q04(spark, sf):
    return Q.q04_mom_pct_change(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                                _t(spark, sf, "nation"))


@register("q05_same_month_yoy")
def _q05(spark, sf):
    return Q.q05_same_month_yoy(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                                _t(spark, sf, "nation"))


@register("q06_moving_average")
def _q06(spark, sf):
    return Q.q06_moving_average(_t(spark, sf, "orders"))


@register("q07_ntile_quartiles")
def _q07(spark, sf):
    return Q.q07_ntile_quartiles(_t(spark, sf, "orders"))


@register("q08_period_compare")
def _q08(spark, sf):
    return Q.q08_period_compare(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                                _t(spark, sf, "nation"))


@register("q09_weekend_effect")
def _q09(spark, sf):
    return Q.q09_weekend_effect(_t(spark, sf, "orders"))


@register("q10_improvement_streaks")
def _q10(spark, sf):
    return Q.q10_improvement_streaks(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                                     _t(spark, sf, "nation"))


@register("rollup_daily_events")
def _rollup_daily(spark, sf):
    return (
        R.daily_rollup(_t(spark, sf, "events"))
        .select("event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
                "daily_avg", "daily_max", "n_events", "day_of_week",
                "is_weekend", "yr", "mon")
    )


@register("rollup_monthly_events")
def _rollup_monthly(spark, sf):
    return R.monthly_rollup(R.daily_rollup(_t(spark, sf, "events"))).select(
        "event_type", "yr", "mon", "monthly_avg", "monthly_max",
        "days_with_data", "exceedance_days", "prev_month_avg",
        "mom_pct_change", "same_month_prev_year_avg", "yoy_month_change")


@register("baselines_events")
def _baselines(spark, sf):
    return R.baselines(_t(spark, sf, "events"))


@register("rollup_annual_nation")
def _rollup_annual(spark, sf):
    yearly = yearly_nation_revenue(_t(spark, sf, "orders"), _t(spark, sf, "customer"),
                                   _t(spark, sf, "nation"))
    return R.annual_nation_rollup(yearly)


def all_queries() -> dict[str, QueryFn]:
    return dict(_REGISTRY)


def all_oracle_sql() -> dict[str, str]:
    # only expose oracles for registered queries (extra entries would fail
    # the driver's pairing)
    return {k: v for k, v in ORACLE.items() if k in _REGISTRY}
