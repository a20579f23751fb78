"""Multi-level aggregation (CUBE / ROLLUP / GROUPING SETS) and exact group
percentiles — aggregation shapes the reference never uses (SURVEY §2.4
'Absent': grouping sets / cube / rollup, percentile aggregates) but that any
warehouse replacing it needs.

Scale notes (100TB): a CUBE over n keys plans Expand (one copy of each
row per grouping set) feeding the PARTIAL hash aggregate — the 2^n-fold
blow-up happens map-side and is immediately collapsed by the partial
aggregate within the same stage, so only (groups x 2^n) rows ever
shuffle, never (rows x 2^n). Verified in the physical plan: Expand ->
partial HashAggregate -> Exchange -> final HashAggregate. Exact
percentiles are the expensive path (per-group sort of all values); the
approx twin (approx_percentiles) uses a fixed-size t-digest-style sketch
that partial-aggregates map-side, the same exact/approx pairing as
distinct_users_daily vs approx_users_daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from asvsp_spark.plans.base import (cents_to_dollars, money_cents,
                                    round_fixed)


def cube_revenue(orders: DataFrame, customer: DataFrame,
                 nation: DataFrame) -> DataFrame:
    """Revenue + order count over CUBE(nation, year): every combination of
    (nation, yr), (nation,), (yr,), and the grand total in one pass.

    grouping_id disambiguates "aggregated over" from a genuinely-NULL key
    (bit set = column aggregated away), mirroring SQL GROUPING().
    """
    from asvsp_spark.plans.base import nation_orders
    base = nation_orders(orders, customer, nation)
    return (
        base
        .withColumn("yr", F.year("o_orderdate"))
        .cube("nation", "yr")
        .agg(F.sum("o_cents").alias("revenue_cents"),
             F.count(F.lit(1)).alias("n_orders"),
             F.grouping_id().alias("gid"))
        .select("nation", "yr", "gid",
                cents_to_dollars(F.col("revenue_cents")).alias("revenue"),
                "n_orders")
    )


def priority_percentiles(orders: DataFrame) -> DataFrame:
    """Exact interpolated percentiles (p25/median/p90) of order value per
    priority. F.percentile is SQL percentile_cont semantics: sort the
    group, linear-interpolate between the two straddling values — the
    exact-but-sortful path; see approx_percentiles for the sketch path.

    Cross-engine parity: percentiles interpolate over exact integer cents
    (identical input -> identical double), then one fixed-point round.
    """
    cents = money_cents(F.col("o_totalprice"))
    d = orders.select("o_orderpriority", cents.alias("cents"))
    agg = d.groupBy("o_orderpriority").agg(
        F.percentile("cents", 0.25).alias("p25_c"),
        F.percentile("cents", 0.5).alias("p50_c"),
        F.percentile("cents", 0.9).alias("p90_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return agg.select(
        "o_orderpriority", "n_orders",
        round_fixed(F.col("p25_c") / 100.0, 4).alias("p25"),
        round_fixed(F.col("p50_c") / 100.0, 4).alias("median"),
        round_fixed(F.col("p90_c") / 100.0, 4).alias("p90"),
    )


def pivot_daily_type(events: DataFrame,
                     types: tuple[str, ...] = ("click", "error", "purchase",
                                               "signup", "view")) -> DataFrame:
    """Native pivot: per-day average value with one column per event type
    — the batch form of sq2's manual conditional-aggregation pivot, using
    Spark's `groupBy().pivot()` with an EXPLICIT value list (omitting it
    costs an extra distinct-scan job to discover the values and makes the
    output schema data-dependent — never do that at 100TB).

    Exact integer-cents averages per cell, same discipline as the rollups.
    """
    cents = F.round(F.col("value") * 100, 0).cast("long")
    d = events.select(F.to_date("ts").alias("day"), "event_type",
                      cents.alias("v"))
    agg = (
        d.groupBy("day")
        .pivot("event_type", list(types))
        .agg(F.round(F.sum("v") / F.count(F.lit(1)), 0).cast("long"))
    )
    out = agg.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        *[(F.col(t) / 100.0).alias(f"avg_{t}") for t in types])
    return out


def unpivot_daily_type(events: DataFrame,
                       types: tuple[str, ...] = ("click", "error",
                                                 "purchase", "signup",
                                                 "view")) -> DataFrame:
    """Melt — the inverse of ``pivot_daily_type``: the wide per-day
    frame (one avg_<type> column per event type) back to long
    (day, event_type, avg_value), via Spark's native ``unpivot``
    (SQL UNPIVOT / pandas melt). Wide->long is the step every
    feature-store export needs before a typed warehouse load, and the
    native operator is a zero-shuffle projection (each input row
    explodes to <= len(types) output rows in place) — never hand-roll
    it as a union of per-column selects, which re-scans the frame
    once per measure.

    NULL cells (a day where that type never occurred) are dropped,
    matching UNPIVOT's EXCLUDE NULLS default; the avg_ prefix is
    stripped so the long frame round-trips back through the pivot.
    """
    wide = pivot_daily_type(events, types)
    long = wide.unpivot(
        ["day"], [f"avg_{t}" for t in types], "event_type", "avg_value")
    return (
        long.where(F.col("avg_value").isNotNull())
        .select("day",
                F.expr("substring(event_type, 5)").alias("event_type"),
                "avg_value")
    )


def approx_percentiles(orders: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Sketch-based percentiles: approx_percentile partial-aggregates a
    bounded-size quantile summary map-side, so per-group memory is O(
    accuracy) regardless of group size — the 100TB path where the exact
    variant's per-group sort would dominate the job. Estimates are
    engine-specific (rows-only check); the error bound vs the exact
    operator is unit-tested.
    """
    cents = money_cents(F.col("o_totalprice"))
    d = orders.select("o_orderpriority", cents.alias("cents"))
    agg = d.groupBy("o_orderpriority").agg(
        F.percentile_approx("cents", [0.25, 0.5, 0.9], accuracy).alias("pc"),
    )
    return agg.select(
        "o_orderpriority",
        (F.col("pc")[0] / 100.0).alias("p25_approx"),
        (F.col("pc")[1] / 100.0).alias("median_approx"),
        (F.col("pc")[2] / 100.0).alias("p90_approx"),
    )


def corpus_datacard(docs: DataFrame) -> DataFrame:
    """The dataset-card table a corpus ships with: one row per
    (source, lang) with document/token volumes, exact length
    percentiles, content-fingerprint duplication rate, and the
    canonical heuristic quality score — everything a consumer reads
    before training on the data, in ONE corpus scan.

    Shape, at 100 TB: a single per-doc projection (tokens, stopwords,
    md5 fingerprint — all codegen expressions) feeds one
    groupBy(source, lang). count/sum/avg combine map-side; the exact
    percentiles and distinct-fingerprint count are the two
    non-partial-aggregatable members, both bounded per group (the
    group count is small — sources × languages), and the distinct
    expands to (group, fp) before collapsing, which is the standard
    count-distinct shuffle. All money is in exact integers; the only
    doubles are the final rounded ratios (round_fixed margins absorb
    summation-order jitter).
    """
    from asvsp_spark.functions import text as TX
    from asvsp_spark.plans.base import round_fixed

    per_doc = (docs
               .withColumn("toks", TX.tokens(F.col("text")))
               .select(
                   "source", "lang",
                   F.size("toks").alias("nt"),
                   TX.stopword_count("toks").alias("ns"),
                   TX.fingerprint(F.col("text")).alias("fp")))
    # integer micro-units: summing longs is exact, so the group average
    # cannot land on a rounding tie that FP summation order could flip
    qi = F.round(
        TX.quality_score_expr(F.col("nt"), F.col("ns")) * 1e6,
        0).cast("long")
    return (per_doc.withColumn("qi", qi)
            .groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("nt").alias("n_tokens"),
                 round_fixed(F.avg("nt"), 2).alias("avg_doc_tokens"),
                 round_fixed(F.percentile("nt", 0.5), 4)
                 .alias("p50_tokens"),
                 round_fixed(F.percentile("nt", 0.95), 4)
                 .alias("p95_tokens"),
                 F.countDistinct("fp").alias("distinct_docs"),
                 round_fixed(
                     F.lit(1.0) - F.countDistinct("fp")
                     / F.count(F.lit(1)), 6).alias("dup_rate"),
                 round_fixed(F.avg("qi") / 1e6, 4).alias("avg_quality")))
