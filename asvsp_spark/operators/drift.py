"""Distribution-drift monitoring — "did today's traffic mix change?"
(categorical-share drift of a key column per day vs the full-period
baseline), the data-quality gate a production ingest pipeline runs
before letting a day's partition into the training corpus.

Two standard divergences per bucket, both over the same share tables:

- KL(bucket || baseline) in nats — sensitive to a bucket putting mass
  where the baseline has little (a new/rare category exploding);
- total variation distance = 0.5 * Σ_types |p_bucket − p_base| — the
  bounded [0,1] "fraction of the bucket's mass that moved", robust to
  the log blow-up. Categories absent from a bucket contribute their
  full baseline mass (accounted via 1 − Σ_present q, no dense
  type×bucket grid materialized).

KL is finite by construction when the baseline aggregates the SAME
data: q > 0 for every category a bucket contains. NULL keys are folded
into the sentinel category "<null>" BEFORE grouping — in real telemetry
NULL is routinely the drifting category, and an equi-join would
silently drop it (NULL never equals NULL), permanently inflating every
bucket's divergence.

Scale: one corpus-scale map-side-combining groupBy(bucket, key); the
count table is localCheckpoint-pinned so the baseline derives from it
rather than re-scanning the corpus (plan-shape-tested); the baseline is
|keys| rows and broadcasts; bucket totals come from a window over the
(buckets × keys)-sized count table. The per-bucket double sums run over
|keys| O(1)-magnitude terms, so cross-engine summation-order error
(~1e-15) sits far from the 1e-6 rounding boundary — same determinism
argument as token_entropy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from asvsp_spark.plans.base import round_fixed

NULL_KEY = "<null>"


def sentinel_key(col: Column) -> Column:
    """String-cast with NULLs folded to the '<null>' category, so the
    divergence join and the cross-engine sort order both see a real
    group instead of silently dropping / reordering NULLs."""
    return F.coalesce(col.cast("string"), F.lit(NULL_KEY))


def divergence_by_bucket(counts: DataFrame, bucket_col: str,
                         base: DataFrame | None = None) -> DataFrame:
    """KL + TVD per bucket from a (bucket, key, c) count table.

    ``base`` is an optional (key, cb) baseline; by default it aggregates
    from ``counts`` itself (full-period self-baseline). Shared by the
    batch monitor below and the streaming twin (sq12) so the two can
    never disagree on the math. The baseline/total derivations hang off
    the count table — bucket×keys-sized, never the corpus."""
    if base is None:
        base = counts.groupBy("key").agg(F.sum("c").alias("cb"))
    tot = base.agg(F.sum("cb").alias("ct"))
    joined = (counts
              .join(F.broadcast(base), "key")
              .crossJoin(F.broadcast(tot))
              .withColumn("_btot", F.sum("c").over(
                  Window.partitionBy(bucket_col))))
    p = F.col("c") / F.col("_btot")
    q = F.col("cb") / F.col("ct")
    return (joined.groupBy(bucket_col)
            .agg(F.sum("c").alias("n_events"),
                 F.count(F.lit(1)).cast("int").alias("n_types"),
                 F.sum(p * F.log(p / q)).alias("_kl"),
                 F.sum(F.abs(p - q)).alias("_l1_present"),
                 F.sum(q).alias("_q_present"))
            .select(bucket_col, "n_events", "n_types",
                    round_fixed(F.col("_kl"), 6).alias("kl_nats"),
                    round_fixed(
                        (F.col("_l1_present") + 1.0 - F.col("_q_present"))
                        / 2.0, 6).alias("tvd")))


def distribution_drift(df: DataFrame, key_col: str = "event_type",
                       ts_col: str = "ts") -> DataFrame:
    """Per-day categorical drift of ``key_col`` vs the full-period
    baseline: (day, n_events, n_types, kl_nats, tvd)."""
    # localCheckpoint pins the (days × keys)-sized count table so the
    # baseline aggregates from it instead of replanning the corpus scan
    # (the same diamond-reuse fix as key_skew_report; plan-shape-tested)
    counts = (df.select(F.to_date(F.col(ts_col)).alias("day"),
                        sentinel_key(F.col(key_col)).alias("key"))
              .groupBy("day", "key")
              .agg(F.count(F.lit(1)).alias("c"))
              .localCheckpoint(eager=False))
    out = divergence_by_bucket(counts, "day")
    # dates travel as strings: the driver's pandas canonicalizer turns
    # DuckDB DATEs into midnight Timestamps otherwise
    return out.select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                      "n_events", "n_types", "kl_nats", "tvd")
