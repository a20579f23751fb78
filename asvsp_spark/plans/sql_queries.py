"""Spark-SQL text variants of q01-q10 plus the extension queries whose
SQL sits in the Spark/DuckDB dialect intersection (EXT_NAMES, 11 as of
r4) — entry point B of the reference (SQL files executed via spark.sql,
export_to_postgres.py:23-27; SURVEY §3.2). The engine promises BOTH a
DataFrame builder and a SQL text per analytic query (SURVEY §7.0);
tests assert the two variants return identical row sets.

The SQL is derived from the DuckDB oracle strings (plans/oracle.py) with
two dialect shims, so the three formulations (DataFrame, Spark SQL,
DuckDB) can never drift apart silently:
- strftime(d, '%Y-%m-%d')     -> date_format(d, 'yyyy-MM-dd')
- dayofweek() weekend set     -> DuckDB 0=Sun..6=Sat vs Spark 1=Sun..7=Sat

Everything else (rank/ntile/lag frames, integer-cents math, the
round(x * 10^d)/10^d stabilized rounding) is already in the dialect
intersection — the reference deliberately kept its queries
HiveQL-and-SparkSQL clean the same way (SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from asvsp_spark import tables
from asvsp_spark.plans.oracle import ORACLE
from asvsp_spark.plans.oracle_ext import ORACLE_EXT
from asvsp_spark.plans.oracle_text import ORACLE_TEXT

Q_NAMES = (
    "q01_yearly_rank_yoy", "q02_peak_month", "q03_cumulative_top10",
    "q04_mom_pct_change", "q05_same_month_yoy", "q06_moving_average",
    "q07_ntile_quartiles", "q08_period_compare", "q09_weekend_effect",
    "q10_improvement_streaks",
)

_DIALECT_SHIMS = (
    # FIRST (later shims match on the one-arg form): DuckDB's
    # trim(text, ' ') — the explicit space charset the r10 NBSP fix
    # added, because DuckDB's DEFAULT trim strips Unicode Zs — maps to
    # Spark's one-arg trim, which strips ASCII space only (the unified
    # semantics). Spark's own two-arg trim(a, b) is trim(trimStr=a
    # FROM b) — arguments REVERSED vs DuckDB — so passing the DuckDB
    # form through unchanged would silently swap string and charset.
    ("trim(text, ' ')", "trim(text)"),
    ("strftime(day, '%Y-%m-%d')", "date_format(day, 'yyyy-MM-dd')"),
    ("dayofweek(day) IN (0, 6)", "dayofweek(day) IN (1, 7)"),
    # Spark SQL parses bare decimal literals as DECIMAL, so BIGINT/100.0
    # would produce DECIMAL columns where the DataFrame API (Python float
    # -> double) produces DOUBLE; the D suffix forces a double literal
    ("/ 100.0", "/ 100.0D"),
    ("/ 10000.0", "/ 10000.0D"),
    ("/ 1000000.0", "/ 1000000.0D"),
    # Spark has no bare VARCHAR cast target / strftime
    ("AS VARCHAR)", "AS STRING)"),
    ("strftime(", "date_format("),
    ("'%Y-%m-%d %H:%M:%S'", "'yyyy-MM-dd HH:mm:ss'"),
    ("'%Y-%m-%d'", "'yyyy-MM-dd'"),
    # DuckDB list surface -> Spark arrays; Spark SQL string literals
    # treat backslash as an escape, so the regex needs it doubled
    (r"len(regexp_split_to_array(trim(text), '\s+'))",
     r"size(split(trim(text), '[ \\t\\n\\f\\r]+'))"),
    # Spark floor(bigint/double) is fine but 256.0 parses as DECIMAL
    ("/ 256.0", "/ 256.0D"),
    # DuckDB date_diff('day', start, end) == Spark datediff(end, start)
    ("date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))",
     "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))"),
    # DuckDB arg_min/arg_max == Spark min_by/max_by; epoch_us == unix_micros.
    # The struct-wrapped form exists only to stop DuckDB's arg_min from
    # skipping NULL args (oracle_ext user_day_bookends); Spark's min_by
    # already keeps them, so the port is plain min_by. Must precede the
    # generic rewrite (shims apply in order).
    ("arg_min({'v': event_type}, ord).v", "min_by(event_type, ord)"),
    ("arg_min(", "min_by("),
    ("arg_max(", "max_by("),
    ("epoch_us(", "unix_micros("),
    # DuckDB regexp_replace needs the 'g' flag; Spark replaces all by
    # default and parses a 4th argument as a position
    (", ' ', 'g')", ", ' ')"),
    # Spark SQL string literals treat backslash as an escape, so the
    # fingerprint's '\s+' would parse as 's+' (deleting letter-s runs
    # instead of collapsing whitespace) — double it, exactly as the
    # regexp_split_to_array shim above does for token splits
    (r"regexp_replace(trim(text), '\s+', ' ')",
     r"regexp_replace(trim(text), '[ \\t\\n\\f\\r]+', ' ')"),
)


def to_spark_sql(duckdb_sql: str) -> str:
    out = duckdb_sql
    for src, dst in _DIALECT_SHIMS:
        out = out.replace(src, dst)
    return out


# Extension queries whose oracle SQL sits in the Spark/DuckDB dialect
# intersection after the same shims (the list-lambda text oracles do
# not; their SQL surface is DuckDB-only by construction).
# heavy_hitters_users' SQL text is the UNPRUNED GROUP BY ... HAVING
# semantic spec — the equivalence test is exactly the statement that the
# DataFrame path's pigeonhole pruning is lossless. packing_bins' window
# prefix-sum SQL ports with the regex-split and decimal-literal shims.
EXT_NAMES = ("funnel_daily", "scd2_user_state",
             "heavy_hitters_users", "packing_bins",
             # r4 widening: the lineitem analytics, percentile/bookend/
             # setops long tail, and the leakage-safe split report all
             # port with the date_diff/arg_min/epoch_us shims above
             "q11_pricing_summary", "q12_late_shipments",
             "q13_supplier_margin_topk", "nation_revenue_distribution",
             "user_day_bookends", "customer_retention_setops",
             "leakage_split_report")

# merged locally: registry also merges these into ORACLE at import, but
# this module must not depend on registry import order
_SOURCES: dict[str, str] = {**ORACLE, **ORACLE_TEXT, **ORACLE_EXT}

SPARK_SQL: dict[str, str] = {name: to_spark_sql(_SOURCES[name])
                             for name in Q_NAMES + EXT_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the tables the SQL variants read."""
    for t in ("orders", "customer", "nation", "events", "documents",
              "lineitem", "supplier"):
        tables.load(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql_variant(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SPARK_SQL[name])
