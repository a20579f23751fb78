"""Range (interval) join: match events to a per-key time interval.

The reference has no range/interval/theta joins (SURVEY §2.3 'Absent');
this is the batch companion to operators/asof.py for interval semantics:
each order is paired with the user's events in [orderdate, orderdate + N
days) — the "what happened after the purchase" join every attribution or
feature-backfill pipeline needs.

Scale notes (100TB): the join keeps an EQUALITY key (user) so Catalyst
plans a hash/sort-merge join partitioned by user, with the time predicate
evaluated as a post-join filter inside the same stage — never a cartesian
nested-loop. Skewed users fan out at most (orders_u x events_u); AQE skew
split handles pathological keys. The aggregated variant collapses to one
row per order before any wide result materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from asvsp_spark.plans.base import round_fixed


def events_after_order(orders: DataFrame, events: DataFrame,
                       days: int = 7) -> DataFrame:
    """Per order: count + value-sum of the customer's events within
    ``days`` days after the order date (inclusive start, exclusive end).
    Orders with no in-range events keep a zero row (left join semantics).
    """
    ev = events.select(
        F.col("user_id"), F.col("ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v_centi"))
    o = orders.select("o_orderkey",
                      F.col("o_custkey").alias("user_id"),
                      F.col("o_orderdate"))
    j = o.join(
        ev,
        (o.user_id == ev.user_id)
        & (ev.ts >= o.o_orderdate)
        & (ev.ts < F.date_add(o.o_orderdate.cast("date"), days)
           .cast("timestamp")),
        "left",
    )
    return (
        j.groupBy("o_orderkey", o.user_id.alias("user_id"), "o_orderdate")
        .agg(F.count(ev.ts).alias("n_events"),
             F.coalesce(F.sum("v_centi"), F.lit(0)).alias("v_centi_sum"))
        .select("o_orderkey", "user_id",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
                "n_events",
                round_fixed(F.col("v_centi_sum") / 100.0, 2)
                .alias("event_value_sum"))
    )
