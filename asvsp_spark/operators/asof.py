"""As-of (most-recent-prior) join — a time-series operator Spark has no
built-in for (SURVEY §2.3 notes the reference also lacks range/as-of
joins; the build brief lists it as a custom-operator target).

Semantics: for every left row, attach the latest right row with
``right_ts <= left_ts`` within the same key group (backward as-of,
inclusive) — DuckDB's ``ASOF JOIN``, pandas' ``merge_asof``.

Spark-first implementation — composition of built-ins, no UDF:

    union(left-tagged, right-tagged)
      -> window per key ordered by (ts, side)
      -> last(right-payload, ignorenulls) carries the most recent right
         row forward onto each left row
      -> filter back to left rows, unpack the payload struct

Scale: ONE hash shuffle on the join key + a per-partition sort — the same
cost as any sort-merge join, and crucially NOT the O(|L| x |R|) blow-up a
naive range-predicate join plans. No per-key data is collected anywhere;
skewed keys split fine under AQE because the window is per-key
independent. At equal timestamps the right row sorts first (side 0 < 1),
making the match inclusive exactly like DuckDB ``ON l.ts >= r.ts``.

The right side must be unique per (key, ts) — pre-aggregate it otherwise
(ties would make "the" most recent row ambiguous in every engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              tolerance: Column | None = None) -> DataFrame:
    """Backward inclusive as-of join.

    Returns all ``left`` columns plus every non-key ``right`` column
    (null when no right row precedes the left row). ``tolerance``
    optionally bounds the lookback: matches older than
    ``left_ts - tolerance`` are nulled out (pandas merge_asof semantics).
    """
    payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    # Standard join semantics: a NULL key never matches (the window's
    # partitionBy would otherwise group NULL with NULL), and a NULL
    # right timestamp carries no ordering evidence (NULLS FIRST would
    # otherwise make it "the match" for left rows that precede every
    # real right row) — drop both from the match index. Left rows keep
    # left-join semantics: they surface with an all-NULL payload.
    # Filter on the CASTED timestamp: a string right_ts whose value
    # fails the cast would pass a raw isNotNull and resurrect the
    # phantom match (r10 review).
    right = (right.filter(F.col(on).isNotNull())
             .filter(F.col(right_ts).cast("timestamp").isNotNull()))
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_ts).cast("timestamp").alias("_rt"),
                 *[F.col(c) for c in payload_cols]).alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_p"].dataType).alias("_p"),
        *[F.col(c) for c in left.columns],
    )
    # NULLS FIRST is load-bearing: a left row with a NULL timestamp
    # sorts before every real right row and therefore matches nothing.
    w = (Window.partitionBy("_k")
         .orderBy(F.asc_nulls_first("_t"), F.asc("_side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "_m", F.when(F.col("_m._rt") >= F.col("_t") - tolerance,
                         F.col("_m")))
    return carried.select(
        *left.columns,
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
        F.col("_m._rt").alias(f"asof_{right_ts}"),
    )


_GRAIN_SECONDS = {"hour": 3600, "day": 86400, "week": 604800}


def gapfill_hourly(events: DataFrame, group_col: str = "event_type",
                   ts_col: str = "ts", value_col: str = "value",
                   fill: str = "locf") -> DataFrame:
    """Hour-grain wrapper over ``gapfill`` — see it for semantics."""
    return gapfill(events, grain="hour", group_col=group_col,
                   ts_col=ts_col, value_col=value_col, fill=fill)


def gapfill(events: DataFrame, grain: str = "hour",
            group_col: str = "event_type",
            ts_col: str = "ts", value_col: str = "value",
            fill: str = "locf") -> DataFrame:
    """Timescale-style ``time_bucket_gapfill`` at ``grain`` ∈ hour /
    day / week: per-group averages on a DENSE bucket spine — every
    (group, bucket) between the corpus-wide min and max bucket gets a
    row, with missing buckets either carried forward (``fill='locf'``),
    linearly interpolated between the straddling observations
    (``'interpolate'`` — Timescale's interpolate(): NULL outside the
    group's observed range), or left NULL (``'null'``). Output:
    (group_col, <grain>, avg_value, n_events, filled) where filled
    marks spine rows with no observations. Spark has no gap-fill
    operator; this is the hypertable-rollup shape built from
    sequence() + explode + a frame-bounded last(ignorenulls).

    Determinism: per-bucket averages divide an EXACT integer cents sum
    by the bucket's count (one IEEE division), so group/partition order
    cannot move a digit — the same convention as every money aggregate
    in the engine.

    Shape, at 100 TB:
    - One aggregation of the raw events to (group, bucket) partials —
      the only corpus-sized shuffle, fully partial-aggregatable.
    - The spine is sequence(min_bucket, max_bucket) exploded once and
      crossJoined with the DISTINCT group values — both sides are
      metadata-sized (hours in a decade ≈ 87k; groups are enum-like),
      and the bucket aggregate LEFT-joins onto it. AQE broadcasts the
      small side at runtime.
    - The fills are one window per group ordered by bucket, running
      over the SPINE (buckets × groups rows, not raw events), with an
      unbounded frame — Spark evaluates last/first(ignorenulls)
      incrementally, so the fill is linear in spine size.
    """
    if grain not in _GRAIN_SECONDS:
        raise ValueError(
            f"grain must be one of {sorted(_GRAIN_SECONDS)}, got {grain!r}")
    if fill not in ("locf", "interpolate", "null"):
        # validate BEFORE the eager aggregation below — an argument typo
        # must not cost a corpus scan
        raise ValueError(
            f"fill must be 'locf', 'interpolate' or 'null', got {fill!r}")
    from asvsp_spark.plans.base import money_cents, round_fixed

    hour = F.date_trunc(grain, F.col(ts_col))
    # the ONE corpus scan: everything below (bounds, groups, spine,
    # fills) derives from this checkpointed metadata-sized aggregate —
    # date_trunc commutes with min/max, so bounds from hourly equal
    # bounds from the raw timestamps
    hourly = (events
              .select(F.col(group_col).alias("g"), hour.alias("hour"),
                      money_cents(F.col(value_col)).alias("cents"))
              .groupBy("g", "hour")
              .agg(F.sum("cents").alias("s"),
                   F.count(F.lit(1)).alias("n_events"))
              .localCheckpoint(eager=True))
    bounds = hourly.agg(F.min("hour").alias("h0"),
                        F.max("hour").alias("h1"))
    spine_hours = bounds.select(F.explode(F.sequence(
        "h0", "h1", F.expr(f"interval 1 {grain}"))).alias("hour"))
    groups = hourly.select("g").distinct()
    spine = spine_hours.crossJoin(F.broadcast(groups))
    joined = (spine.join(hourly, ["g", "hour"], "left")
              .withColumn("avg_raw",
                          round_fixed(F.col("s") / 100.0
                                      / F.col("n_events"), 4)))
    if fill == "locf":
        w = (Window.partitionBy("g").orderBy("hour")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled_val = F.last("avg_raw", ignorenulls=True).over(w)
    elif fill == "interpolate":
        # straddling observations via two frame-bounded ignorenulls
        # windows over the spine; the weight is exact integer bucket
        # arithmetic, so the blend is one identical IEEE expression in
        # both engines. NULL outside the observed range by
        # construction: a missing prev or next nulls the blend.
        wp = (Window.partitionBy("g").orderBy("hour")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wn = (Window.partitionBy("g").orderBy("hour")
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        # bucket index = POSITION on the dense spine, not epoch/grain
        # arithmetic: calendar buckets are not fixed-length in seconds
        # (a DST-spring day is 23h), so epoch division can collide two
        # adjacent day/week buckets onto one integer and skew the blend
        # weights. The spine is dense and ordered per group by
        # construction, so row_number IS the exact bucket index; it
        # shares the fill windows' partitioning (no extra exchange).
        idx_w = Window.partitionBy("g").orderBy("hour")
        joined = joined.withColumn("eh", F.row_number().over(idx_w))
        eh = F.col("eh")
        obs_h = F.when(F.col("s").isNotNull(), eh)
        pv = F.last("avg_raw", ignorenulls=True).over(wp)
        ph = F.last(obs_h, ignorenulls=True).over(wp)
        nv = F.first("avg_raw", ignorenulls=True).over(wn)
        nh = F.first(obs_h, ignorenulls=True).over(wn)
        frac = (eh - ph) / F.when(nh != ph, nh - ph)
        filled_val = F.coalesce(
            F.col("avg_raw"), round_fixed(pv + (nv - pv) * frac, 4))
    elif fill == "null":
        filled_val = F.col("avg_raw")
    else:
        raise ValueError(
            f"fill must be 'locf', 'interpolate' or 'null', got {fill!r}")
    return joined.select(
        F.col("g").alias(group_col), F.col("hour").alias(grain),
        filled_val.alias("avg_value"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("s").isNull().alias("filled"))
