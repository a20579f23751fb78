"""DuckDB oracle SQL for the streaming queries (streaming/queries.py).

Window equivalence under single-batch drain semantics:
- tumbling 1h window  -> date_trunc('hour', ts)
- sliding 3h/1h window-> membership in the 3 starts
  {trunc(ts) - 2h, trunc(ts) - 1h, trunc(ts)} (epoch-aligned, same as
  Spark's F.window("ts", "3 hours", "1 hour"))
- the 2h watermark drops nothing when the whole history is one batch
  (watermark advances only between batches), so the oracle is the plain
  full-history aggregation.

Dialect shims as in oracle_rollups.py (dayofweek 0..6, BIGINT casts),
plus: `/` on BIGINT is float division in DuckDB (matches Spark long/long),
json_extract for the props decode, and x * INTERVAL 1 HOUR for window
offsets.
"""

from __future__ import annotations

ORACLE_STREAM: dict[str, str] = {}

_BASE = """
    SELECT event_type, CAST(month(ts) AS INT) AS mon, CAST(hour(ts) AS INT) AS hr,
           dayofweek(CAST(ts AS DATE)) IN (0, 6) AS is_weekend,
           CAST(round(sum(CAST(round(value * 100) AS BIGINT))
                / count(*)) AS BIGINT) / 100.0 AS baseline_avg
    FROM events GROUP BY 1, 2, 3, 4
"""

_HOURLY_TYPE = """
    SELECT event_type, date_trunc('hour', ts) AS ws,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_sum,
           count(*) AS n_events
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""

ORACLE_STREAM["sq1_vs_baseline"] = f"""
WITH agg AS ({_HOURLY_TYPE}),
base AS ({_BASE})
SELECT strftime(a.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       a.event_type, a.n_events,
       CAST(round(a.v_sum / a.n_events) AS BIGINT) / 100.0 AS avg_value,
       b.baseline_avg,
       round(CAST(round(a.v_sum / a.n_events) AS BIGINT) / 100.0
             / b.baseline_avg * 100.0 * 100) / 100.0 AS pct_of_baseline
FROM agg a
LEFT JOIN base b
  ON b.event_type = a.event_type
 AND b.mon = month(a.ws) AND b.hr = hour(a.ws)
 AND b.is_weekend = (dayofweek(CAST(a.ws AS DATE)) IN (0, 6))
"""

_SLIDING = """
    SELECT date_trunc('hour', ts) - off * INTERVAL 1 HOUR AS ws,
           event_type,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS off)
    WHERE ts IS NOT NULL
"""


def _sq2_type_cols() -> str:
    cols = []
    for t in ("click", "error", "purchase", "signup", "view"):
        cols.append(
            f"CASE WHEN count(CASE WHEN event_type = '{t}' THEN 1 END) > 0 "
            f"THEN CAST(round(sum(CASE WHEN event_type = '{t}' THEN v END) "
            f"/ count(CASE WHEN event_type = '{t}' THEN 1 END)) AS BIGINT) / 100.0 "
            f"END AS avg_{t}")
    return ",\n           ".join(cols)


ORACLE_STREAM["sq2_dominant_trend"] = f"""
WITH sw AS ({_SLIDING}),
agg AS (
    SELECT ws, count(*) AS n_all,
           CAST(round(sum(v) / count(*)) AS BIGINT) / 100.0 AS overall_avg,
           {_sq2_type_cols()}
    FROM sw GROUP BY ws
),
dom AS (
    SELECT *,
           greatest(coalesce(avg_click, -1.0), coalesce(avg_error, -1.0),
                    coalesce(avg_purchase, -1.0), coalesce(avg_signup, -1.0),
                    coalesce(avg_view, -1.0)) AS best
    FROM agg
),
t AS (
    SELECT *,
           CASE WHEN coalesce(avg_click, -1.0) = best THEN 'click'
                WHEN coalesce(avg_error, -1.0) = best THEN 'error'
                WHEN coalesce(avg_purchase, -1.0) = best THEN 'purchase'
                WHEN coalesce(avg_signup, -1.0) = best THEN 'signup'
                ELSE 'view' END AS dominant_type,
           lag(overall_avg) OVER (ORDER BY ws) AS prev_avg
    FROM dom
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       n_all, overall_avg, avg_click, avg_error, avg_purchase, avg_signup,
       avg_view, dominant_type, best AS dominant_avg,
       CASE WHEN prev_avg IS NULL THEN 'unknown'
            WHEN overall_avg > prev_avg * 1.1 THEN 'rising'
            WHEN overall_avg < prev_avg * 0.9 THEN 'falling'
            ELSE 'stable' END AS trend
FROM t
"""

ORACLE_STREAM["sq3_top_users"] = """
WITH agg AS (
    SELECT date_trunc('hour', ts) AS ws, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_sum,
           count(*) AS n_events,
           -- json_valid guard: the engine's from_json is PERMISSIVE
           -- (malformed props -> NULL k); unguarded json_extract
           -- errors on malformed text (r10 events edge probe)
           CAST(sum(CASE WHEN json_valid(props)
                    THEN CAST(json_extract(props, '$.k') AS INT) END)
                AS BIGINT) AS k_sum
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
r AS (
    SELECT *,
           CAST(dense_rank() OVER (
               PARTITION BY ws
               ORDER BY CAST(round(v_sum / n_events) AS BIGINT) DESC) AS INT)
               AS rnk
    FROM agg
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, user_id, n_events,
       CAST(round(v_sum / n_events) AS BIGINT) / 100.0 AS avg_value,
       round(k_sum / n_events * 10000) / 10000.0 AS avg_k, rnk
FROM r WHERE rnk <= 5
"""

ORACLE_STREAM["sq4_engagement_conversion"] = f"""
WITH eng AS (
    SELECT date_trunc('hour', ts) AS ws,
           CAST(round(sum(CAST(round(value * 100) AS BIGINT)) / count(*))
                AS BIGINT) / 100.0 AS eng_avg,
           count(*) AS n_eng
    FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
),
conv AS (
    SELECT date_trunc('hour', ts) AS ws,
           CAST(round(sum(CAST(round(value * 100) AS BIGINT)) / count(*))
                AS BIGINT) / 100.0 AS conv_avg,
           count(*) AS n_conv
    FROM events WHERE event_type IN ('purchase', 'signup') GROUP BY 1
),
base AS ({_BASE}),
j AS (
    SELECT e.ws, e.eng_avg, e.n_eng, c.conv_avg, c.n_conv, b.baseline_avg,
           round(e.eng_avg * c.conv_avg / 100.0 * 10000) / 10000.0
               AS interaction_score,
           round(c.conv_avg / b.baseline_avg * 10000) / 10000.0
               AS conv_vs_baseline
    FROM eng e
    JOIN conv c ON c.ws = e.ws
    LEFT JOIN base b
      ON b.event_type = 'purchase'
     AND b.mon = month(e.ws) AND b.hr = hour(e.ws)
     AND b.is_weekend = (dayofweek(CAST(e.ws AS DATE)) IN (0, 6))
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       eng_avg, n_eng, conv_avg, n_conv, baseline_avg, interaction_score,
       conv_vs_baseline,
       CASE WHEN baseline_avg IS NULL THEN 'no_baseline'
            WHEN conv_vs_baseline > 1.5 THEN 'surge'
            WHEN conv_vs_baseline > 1.1 THEN 'elevated'
            WHEN conv_vs_baseline >= 0.9 THEN 'normal'
            ELSE 'quiet' END AS status
FROM j
"""

ORACLE_STREAM["sq5_rank_anomaly"] = f"""
WITH agg AS ({_HOURLY_TYPE}),
cur AS (
    SELECT ws, event_type,
           CAST(round(v_sum / n_events) AS BIGINT) / 100.0 AS avg_value
    FROM agg
),
ranked AS (
    SELECT *,
           CAST(dense_rank() OVER (PARTITION BY ws ORDER BY avg_value DESC)
                AS INT) AS current_rank
    FROM cur
),
base AS ({_BASE}),
hist AS (
    SELECT event_type, mon, hr, is_weekend,
           CAST(dense_rank() OVER (PARTITION BY mon, hr, is_weekend
                                   ORDER BY baseline_avg DESC) AS INT)
               AS historical_rank
    FROM base
)
SELECT strftime(r.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       r.event_type, r.avg_value, r.current_rank, h.historical_rank,
       CAST(abs(r.current_rank - h.historical_rank) AS INT)
           AS rank_displacement,
       abs(r.current_rank - h.historical_rank) >= 2 AS is_unusual
FROM ranked r
LEFT JOIN hist h
  ON h.event_type = r.event_type
 AND h.mon = month(r.ws) AND h.hr = hour(r.ws)
 AND h.is_weekend = (dayofweek(CAST(r.ws AS DATE)) IN (0, 6))
"""

# Continuous-mode stateful trend (streaming/stateful.py): hourly averages
# per type with a lag label; only windows whose END has passed the final
# 2h watermark (window_end <= max(ts) - 2h) are emitted — the lag runs
# over exactly that per-key prefix, so lag-then-filter is equivalent.
ORACLE_STREAM["sq2c_stateful_trend"] = f"""
WITH b AS ({_HOURLY_TYPE}),
m AS (SELECT max(ts) AS mx FROM events),
t AS (
    SELECT event_type, ws, n_events,
           CAST(round(v_sum / n_events) AS BIGINT) / 100.0 AS avg_value,
           lag(CAST(round(v_sum / n_events) AS BIGINT) / 100.0)
             OVER (PARTITION BY event_type ORDER BY ws) AS prev_avg
    FROM b
)
SELECT t.event_type,
       strftime(t.ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       t.n_events, t.avg_value, t.prev_avg,
       CASE WHEN t.prev_avg IS NULL THEN 'unknown'
            WHEN t.avg_value > t.prev_avg * 1.1 THEN 'rising'
            WHEN t.avg_value < t.prev_avg * 0.9 THEN 'falling'
            ELSE 'stable' END AS trend
FROM t, m
WHERE t.ws + INTERVAL 1 HOUR <= m.mx - INTERVAL 2 HOUR
"""

# Spark side: streaming/queries.py sq10_funnel_hourly (stream funnel).
ORACLE_STREAM["sq10_funnel_hourly"] = """
WITH per_user AS (
    SELECT date_trunc('hour', ts) AS w, user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
flags AS (
    SELECT w,
           (t_view IS NOT NULL) AS s1,
           (t_view IS NOT NULL AND t_click IS NOT NULL
            AND t_click >= t_view) AS s2,
           (t_view IS NOT NULL AND t_click IS NOT NULL
            AND t_click >= t_view AND t_signup IS NOT NULL
            AND t_signup >= t_click) AS s3,
           (t_view IS NOT NULL AND t_click IS NOT NULL
            AND t_click >= t_view AND t_signup IS NOT NULL
            AND t_signup >= t_click AND t_purchase IS NOT NULL
            AND t_purchase >= t_signup) AS s4
    FROM per_user
)
SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
       CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_after,
       CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after,
       round((CASE WHEN sum(CASE WHEN s1 THEN 1 ELSE 0 END) > 0
              THEN sum(CASE WHEN s4 THEN 1 ELSE 0 END)
                   / sum(CASE WHEN s1 THEN 1 ELSE 0 END)
              ELSE 0.0 END) * 1000000) / 1000000.0 AS conversion
FROM flags
GROUP BY w
"""

# Spark side: streaming/queries.py sq11_late_audit — batch 1 = even
# event_ids (sets watermark = its max ts - 2h), batch 2 = odd ids; the
# late side output is exactly batch 2's rows older than that watermark.
ORACLE_STREAM["sq11_late_audit"] = """
WITH wm AS (
    SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events WHERE event_id % 2 = 0
),
late AS (
    SELECT * FROM events
    WHERE event_id % 2 = 1 AND ts < (SELECT w FROM wm)
)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_late,
       CAST(sum(event_id) AS BIGINT) AS late_id_sum
FROM late GROUP BY 1
"""

# Spark side: operators/asof.py gapfill_hourly (registry: events,
# group=event_type, locf). Dense hour spine via generate_series; cents
# sums keep the averages FP-order-proof; LOCF = last_value IGNORE NULLS
# over the spine.
ORACLE_STREAM["gapfill_hourly_values"] = r"""
WITH hourly AS (
    SELECT event_type AS g, date_trunc('hour', ts) AS hour,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT date_trunc('hour', min(ts)) AS h0,
           date_trunc('hour', max(ts)) AS h1
    FROM events
),
spine AS (
    SELECT g, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
    FROM bounds, (SELECT DISTINCT event_type AS g FROM events)
),
joined AS (
    SELECT sp.g, sp.hour, h.s, h.n_events,
           round(h.s / 100.0 / h.n_events * 10000) / 10000.0 AS avg_raw
    FROM spine sp LEFT JOIN hourly h ON h.g = sp.g AND h.hour = sp.hour
)
SELECT g AS event_type, hour,
       last_value(avg_raw IGNORE NULLS) OVER (
           PARTITION BY g ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value,
       coalesce(n_events, 0) AS n_events,
       s IS NULL AS filled
FROM joined
"""

# Spark side: gapfill_hourly(fill='interpolate'). Same spine; the blend
# weight is exact integer hour arithmetic and the interpolation is one
# identical IEEE expression, rounded once at 4dp.
ORACLE_STREAM["gapfill_hourly_interp"] = r"""
WITH hourly AS (
    SELECT event_type AS g, date_trunc('hour', ts) AS hour,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT date_trunc('hour', min(ts)) AS h0,
           date_trunc('hour', max(ts)) AS h1
    FROM events
),
spine AS (
    SELECT g, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
    FROM bounds, (SELECT DISTINCT event_type AS g FROM events)
),
joined AS (
    SELECT sp.g, sp.hour, h.s, h.n_events,
           round(h.s / 100.0 / h.n_events * 10000) / 10000.0 AS avg_raw,
           row_number() OVER (PARTITION BY sp.g ORDER BY sp.hour) AS eh
    FROM spine sp LEFT JOIN hourly h ON h.g = sp.g AND h.hour = sp.hour
),
w AS (
    SELECT g, hour, s, n_events, avg_raw, eh,
           last_value(avg_raw IGNORE NULLS) OVER wp AS pv,
           last_value(CASE WHEN s IS NOT NULL THEN eh END IGNORE NULLS)
               OVER wp AS ph,
           first_value(avg_raw IGNORE NULLS) OVER wn AS nv,
           first_value(CASE WHEN s IS NOT NULL THEN eh END IGNORE NULLS)
               OVER wn AS nh
    FROM joined
    WINDOW wp AS (PARTITION BY g ORDER BY hour
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY g ORDER BY hour
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT g AS event_type, hour,
       coalesce(avg_raw,
                round((pv + (nv - pv) * ((eh - ph)
                       / (CASE WHEN nh <> ph THEN nh - ph END)))
                      * 10000) / 10000.0) AS avg_value,
       coalesce(n_events, 0) AS n_events,
       s IS NULL AS filled
FROM w
"""

# Spark side: gapfill(grain='day', fill='locf') — same construction as
# the hourly mirror at the day bucket.
ORACLE_STREAM["gapfill_daily_values"] = r"""
WITH daily AS (
    SELECT event_type AS g, date_trunc('day', ts) AS day,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT date_trunc('day', min(ts)) AS h0,
           date_trunc('day', max(ts)) AS h1
    FROM events
),
spine AS (
    SELECT g, unnest(generate_series(h0, h1, INTERVAL 1 DAY)) AS day
    FROM bounds, (SELECT DISTINCT event_type AS g FROM events)
),
joined AS (
    SELECT sp.g, sp.day, h.s, h.n_events,
           round(h.s / 100.0 / h.n_events * 10000) / 10000.0 AS avg_raw
    FROM spine sp LEFT JOIN daily h ON h.g = sp.g AND h.day = sp.day
)
SELECT g AS event_type, day,
       last_value(avg_raw IGNORE NULLS) OVER (
           PARTITION BY g ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value,
       coalesce(n_events, 0) AS n_events,
       s IS NULL AS filled
FROM joined
"""

# Spark side: gapfill(grain='week', fill='locf') — same construction at
# the ISO week bucket: date_trunc('week') is Monday-anchored in BOTH
# engines, and the spine steps a calendar week at a time.
ORACLE_STREAM["gapfill_weekly_values"] = r"""
WITH weekly AS (
    SELECT event_type AS g, date_trunc('week', ts) AS week,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
),
bounds AS (
    SELECT date_trunc('week', min(ts)) AS h0,
           date_trunc('week', max(ts)) AS h1
    FROM events
),
spine AS (
    SELECT g, unnest(generate_series(h0, h1, INTERVAL 1 WEEK)) AS week
    FROM bounds, (SELECT DISTINCT event_type AS g FROM events)
),
joined AS (
    SELECT sp.g, sp.week, h.s, h.n_events,
           round(h.s / 100.0 / h.n_events * 10000) / 10000.0 AS avg_raw
    FROM spine sp LEFT JOIN weekly h ON h.g = sp.g AND h.week = sp.week
)
SELECT g AS event_type, week,
       last_value(avg_raw IGNORE NULLS) OVER (
           PARTITION BY g ORDER BY week
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value,
       coalesce(n_events, 0) AS n_events,
       s IS NULL AS filled
FROM joined
"""

# sq16: the oracle decodes the same JSON through DuckDB's json functions
# and groups by the raw event_type — the Spark side re-derives it via a
# nested $.m.t variant traversal over a format_string-built document, so
# the values are identical by construction (same stance as the batch
# variant_props_decode oracle).
ORACLE_STREAM["sq16_variant_hourly"] = """
WITH d AS (
    -- json_valid guards mirror the engine's try_parse_json (malformed
    -- props decode to NULL, still counted — see the batch
    -- variant_props_decode oracle)
    SELECT ts, event_type,
           CASE WHEN json_valid(props)
                THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k,
           CASE WHEN json_valid(props)
                THEN json_extract(props, '$.retry') END AS retry
    FROM events WHERE ts IS NOT NULL
)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type AS etype,
       count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(max(k) AS BIGINT) AS k_max,
       count(*) - count(retry) AS n_missing_retry
FROM d GROUP BY 1, 2
"""
