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
    w = (Window.partitionBy("_k").orderBy("_t", "_side")
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
