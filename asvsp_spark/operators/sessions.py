"""Sessionization via Spark's native session windows — a streaming/batch
operator the reference lacks (SURVEY §2.8 'absent: session windows') and
a staple of both user analytics and training-data pipelines (grouping a
user's events into browsing sessions, chat turns into conversations).

``F.session_window(ts, gap)`` merges an event into the current session
while it arrives at or before ``last_ts + gap`` — an event at exactly
the gap boundary still MERGES (verified in tests/test_timeseries_ops.py);
only a strictly larger gap starts a new session. The equivalent
relational form is the classic gaps-and-islands sessionize — lag -> gap
flag -> running sum as session id — which is what the DuckDB oracle
runs; both engines compare timestamps at microsecond precision.

Scale: one shuffle on (user_id) with map-side nothing to combine — the
session assignment is a per-key sort, same cost envelope as any window
function; session state in STREAMING mode is bounded by the watermark
(Spark drops sessions once watermark passes their end), so the same
expression works incrementally with ``withWatermark`` upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from asvsp_spark.operators.rollups import centi_avg, value_centi

DEFAULT_GAP = "30 minutes"


def user_sessions(events: DataFrame, gap: str = DEFAULT_GAP) -> DataFrame:
    """One row per (user, session): bounds, event count, exact-integer
    value stats, and dwell seconds (last event -> session end is the gap,
    so dwell = span of observed events)."""
    sw = F.session_window("ts", gap)
    return (
        events
        .groupBy(F.col("user_id"), sw.alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(value_centi(F.col("value"))).alias("v_cents"),
             F.min("ts").alias("first_ts"),
             F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            centi_avg(F.col("v_cents"), F.col("n_events")).alias("avg_value"),
            (F.unix_micros("last_ts") - F.unix_micros("first_ts"))
            .alias("dwell_us"),
        )
    )
