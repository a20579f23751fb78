"""Pairwise time-series correlation between per-key hourly series —
"which event types move together?" (cf. distributed time-series
similarity search, EDBT 2019: align series on a common time grid, then
compare; here the comparison is Pearson r).

Parity discipline: ``F.corr`` aggregates doubles, whose summation order
is nondeterministic under distribution — so instead the operator
aggregates the six EXACT integer moments (n, Sx, Sy, Sxy, Sx2, Sy2) over
centi-quantized hourly averages and evaluates the Pearson formula once
in the projection. Identical integers -> identical double -> identical
hash in any engine, any shuffle order.

Scale: hourly series first (one partial-aggregating groupBy collapses
the fact table to |keys| x |hours| rows), then a self-join on the hour
grid — the joined frame is (pairs x hours), tiny for bounded key sets.
For thousands of keys, block the pair space or pre-filter with a cheap
sketch (e.g. SimHash of the series sign pattern) before exact r.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from asvsp_spark.operators.rollups import value_centi
from asvsp_spark.plans.base import round_fixed


def hourly_series(events: DataFrame) -> DataFrame:
    """(event_type, hour, centi-avg value): the aligned time grid."""
    return (
        events
        .groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
        .agg(F.sum(value_centi(F.col("value"))).alias("v_sum"),
             F.count(F.lit(1)).alias("n"))
        .select("hr", "event_type",
                F.round(F.col("v_sum") / F.col("n"), 0)
                .cast("long").alias("v"))
    )


def type_correlation(events: DataFrame) -> DataFrame:
    """Pearson correlation of hourly-average series for every event-type
    pair, over the hours where BOTH types have data (inner join on the
    grid — missing hours are absence, not zeros)."""
    s = hourly_series(events)
    a = s.select(F.col("hr"), F.col("event_type").alias("type_a"),
                 F.col("v").alias("x"))
    b = s.select(F.col("hr"), F.col("event_type").alias("type_b"),
                 F.col("v").alias("y"))
    paired = a.join(b, "hr").filter(F.col("type_a") < F.col("type_b"))
    m = (
        paired.groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("x").alias("sx"), F.sum("y").alias("sy"),
             F.sum(F.col("x") * F.col("y")).alias("sxy"),
             F.sum(F.col("x") * F.col("x")).alias("sx2"),
             F.sum(F.col("y") * F.col("y")).alias("sy2"))
    )
    num = m.n * m.sxy - m.sx * m.sy
    den = F.sqrt((m.n * m.sx2 - m.sx * m.sx).cast("double")) \
        * F.sqrt((m.n * m.sy2 - m.sy * m.sy).cast("double"))
    return m.select(
        "type_a", "type_b", F.col("n").alias("n_hours"),
        round_fixed(num / den, 6).alias("pearson_r"))
