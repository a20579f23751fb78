"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
by Spark as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

Why this exists beside ``approx_count_distinct``: that function returns
only a NUMBER, so every rollup granularity must rescan the raw data. A
stored SKETCH is mergeable — daily sketches union into weekly/monthly/
annual estimates without touching raw events again, which is the whole
trick behind warehouse "pre-aggregated distinct" tables at 100 TB: the
fact scan happens once, every coarser rollup is a union over tiny
binary columns (~1.5 KB each at lgK=12, ~2% rsd).

Estimates are engine-specific (rows-only for the driver oracle); the
unit tests pin the error bound against exact counts and the merge
identity (union of daily == sketch of the whole month).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def daily_user_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """One HLL sketch of distinct user_id per (day, event_type) — the
    stored pre-aggregate. Partial-aggregates map-side like any agg; the
    shuffle carries one ~1.5 KB sketch per group."""
    return (
        events
        .withColumn("day", F.to_date("ts"))
        .groupBy("day", "event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"))
    )


def monthly_distinct_users(daily: DataFrame) -> DataFrame:
    """Monthly distinct-user estimates from the DAILY sketches alone —
    no raw-event rescan: union the binary sketches per (month,
    event_type) and estimate."""
    return (
        daily
        .groupBy(F.date_format("day", "yyyy-MM").alias("month"),
                 "event_type")
        .agg(F.hll_union_agg("sketch").alias("msk"))
        .select("month", "event_type",
                F.hll_sketch_estimate("msk").alias("est_users"))
    )


def hll_user_rollup(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Registered shape: day-level estimates + the month-level estimates
    derived purely by sketch union, in one long frame (level column), so
    the mergeability is visible in the output."""
    daily = daily_user_sketches(events, lg_k).localCheckpoint(eager=False)
    day_level = daily.select(
        F.lit("day").alias("level"),
        F.date_format("day", "yyyy-MM-dd").alias("period"),
        "event_type",
        F.hll_sketch_estimate("sketch").alias("est_users"))
    month_level = monthly_distinct_users(daily).select(
        F.lit("month").alias("level"),
        F.col("month").alias("period"),
        "event_type", "est_users")
    return day_level.unionByName(month_level)


def heavy_hitters(df: DataFrame, key_cols: list[str],
                  s_num: int = 3, s_den: int = 1000) -> DataFrame:
    """EXACT frequent items above a frequency share threshold — every
    key with count >= n * s_num / s_den — found WITHOUT shuffling the
    full key cardinality (the distributed Misra-Gries / SpaceSaving
    trade re-expressed relationally; no reference analogue).

    Why not a plain groupBy-HAVING: at 100 TB a global groupBy on an
    ultra-high-cardinality key (user id, URL, n-gram) shuffles EVERY
    distinct key once even though only a handful can clear the
    threshold. This operator prunes first with the pigeonhole bound: if
    freq(x) >= n * s then in at least one partition p, the local
    freq_p(x) >= n_p * s. So:

      pass 1 — count per (partition, key): the (pid, key) groupBy is a
        map-side-partial shuffle whose output is per-partition counts; a
        window over pid derives each partition's total, and keys
        clearing the LOCAL threshold become candidates (a provable
        superset of the true heavy hitters, typically tiny);
      pass 2 — broadcast the candidates, semi-join the raw rows (no
        key shuffle — the broadcast hash filter runs map-side), exact
        count only those, keep count * s_den >= n * s_num.

    All threshold arithmetic is integer cross-multiplication (count *
    s_den vs n * s_num) — no float rounding, so DuckDB's plain
    GROUP BY ... HAVING oracle matches bit-for-bit, which is also the
    proof the pruning loses nothing. The candidate guarantee holds for
    ANY partitioning of the input.
    """
    from pyspark.sql import Window

    n = df.count()
    keyed = df.select(*key_cols,
                      F.spark_partition_id().alias("_pid"))
    local = keyed.groupBy("_pid", *key_cols).agg(
        F.count(F.lit(1)).alias("_lc"))
    w = Window.partitionBy("_pid")
    cand = (local
            .withColumn("_ln", F.sum("_lc").over(w))
            .filter(F.col("_lc") * s_den >= F.col("_ln") * s_num)
            .select(*key_cols).distinct())
    return (
        df.join(F.broadcast(cand), key_cols, "left_semi")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * s_den >= F.lit(n) * s_num)
    )
