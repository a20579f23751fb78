"""Distribution-drift monitoring — "did today's traffic mix change?"
(categorical-share drift of a key column per day vs the full-period
baseline), the data-quality gate a production ingest pipeline runs
before letting a day's partition into the training corpus.

Two standard divergences per day, both over the same share tables:

- KL(day || baseline) in nats — sensitive to a day putting mass where
  the baseline has little (a new/rare category exploding);
- total variation distance = 0.5 * Σ_types |p_day − p_base| — the
  bounded [0,1] "fraction of the day's mass that moved", robust to the
  log blow-up. Categories absent from a day contribute their full
  baseline mass (accounted via 1 − Σ_present q, no dense type×day grid
  materialized).

KL is finite by construction: the baseline aggregates the SAME data, so
q > 0 for every category a day contains.

Scale: one corpus-scale map-side-combining groupBy(day, key); the
baseline table is |keys| rows and broadcasts; the day totals come from
a window over the (days × keys)-sized count table, not a second corpus
scan. The per-day double sums run over |keys| O(1)-magnitude terms, so
cross-engine summation-order error (~1e-15) sits far from the 1e-6
rounding boundary — same determinism argument as token_entropy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from asvsp_spark.plans.base import round_fixed


def distribution_drift(df: DataFrame, key_col: str = "event_type",
                       ts_col: str = "ts") -> DataFrame:
    """Per-day categorical drift of ``key_col`` vs the full-period
    baseline: (day, n_events, n_types, kl_nats, tvd)."""
    counts = (df.select(F.to_date(F.col(ts_col)).alias("day"),
                        F.col(key_col).cast("string").alias("key"))
              .groupBy("day", "key")
              .agg(F.count(F.lit(1)).alias("c")))
    base = counts.groupBy("key").agg(F.sum("c").alias("cb"))
    tot = base.agg(F.sum("cb").alias("ct"))
    joined = (counts
              .join(F.broadcast(base), "key")
              .crossJoin(F.broadcast(tot))
              .withColumn("day_tot",
                          F.sum("c").over(Window.partitionBy("day"))))
    p = F.col("c") / F.col("day_tot")
    q = F.col("cb") / F.col("ct")
    return (joined.groupBy("day")
            .agg(F.sum("c").alias("n_events"),
                 F.count(F.lit(1)).cast("int").alias("n_types"),
                 F.sum(p * F.log(p / q)).alias("_kl"),
                 F.sum(F.abs(p - q)).alias("_l1_present"),
                 F.sum(q).alias("_q_present"))
            # dates travel as strings: the driver's pandas canonicalizer
            # turns DuckDB DATEs into midnight Timestamps otherwise
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_events", "n_types",
                    round_fixed(F.col("_kl"), 6).alias("kl_nats"),
                    round_fixed(
                        (F.col("_l1_present") + 1.0 - F.col("_q_present"))
                        / 2.0, 6).alias("tvd")))
