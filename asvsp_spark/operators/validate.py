"""Declarative data-quality constraint suites — the Deequ /
Great-Expectations role: assert a table's contract (completeness,
uniqueness, domains, ranges, referential integrity) and emit one
metric row per constraint, so an ingest pipeline can gate a partition
on ``passed`` before it reaches the corpus.

Parity note: the reference hand-repairs known-bad domain values at
ingest (its 18-way state-name CASE chain — see sources/ingest.py
``repair_values``, SURVEY §2.2 P6) but never MEASURES contract
violations; this module is the beyond-parity measurement half that
decides whether a repair/quarantine step is needed at all, the same
relationship drift.py has to the ingest gate.

Shape, at 100 TB:

- Every scan-shaped check (not_null / in_range / in_set / matches /
  unique / min_rows) over one table compiles into a SINGLE aggregate
  over ONE pass of that table — conditional sums partial-aggregate
  map-side, so the shuffle carries one row per check suite, not per
  data row. Adding checks adds projection columns, never scans.
- ``unique`` uses an exact count(DISTINCT col). Spark plans multiple
  distinct aggregates in one query via Expand (one duplicated scan row
  per distinct column), so each additional unique-check on the same
  table multiplies the pre-shuffle row stream; keep exact unique
  checks to the key columns (1-2 per table) and use sketches
  (operators/sketches.py) for advisory cardinality profiling.
- ``foreign_key`` is the one check that cannot ride the single pass:
  it LEFT-joins the child keys against the DISTINCT parent keys and
  counts misses. The distinct parent side is dimension-sized in any
  sane schema, so AQE broadcasts it at runtime; past the broadcast
  threshold it degrades to a key-partitioned SortMergeJoin — never a
  cartesian, never a driver collect.
- The assembled report is |checks| rows; the final orderBy is over
  that metadata-sized frame.

Determinism: every metric is a ratio of exact counts rounded via the
round_fixed contract (plans/base.py), so the full report is
bit-identical in DuckDB and hash-checkable by the driver oracle
(plans/oracle_ext.py ``data_quality_report``).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from asvsp_spark.plans.base import round_fixed

_SCALE = 6  # metric decimals; matches the oracle's round(x*1e6)/1e6

REPORT_COLUMNS = ("table", "check", "column", "metric", "threshold",
                  "passed", "severity")

SEVERITIES = ("error", "warn")


def _frac(viol: Column, denom: Column) -> Column:
    """violations / denominator as a stable double; 0.0 on an empty
    denominator (an empty table violates nothing — min_rows is the
    check that catches emptiness)."""
    return round_fixed(
        F.coalesce(viol.cast("double") /
                   F.nullif(denom.cast("double"), F.lit(0)), F.lit(0.0)),
        _SCALE)


def _scan_metric(check: Mapping[str, Any]) -> tuple[Column, str]:
    """(aggregate metric column, human check id) for one scan-shaped
    check. Fraction checks measure violations among the relevant rows
    (non-null rows for domain checks — completeness is not_null's job)."""
    kind = check["check"]
    col_name = check.get("column", "")
    c = F.col(col_name) if col_name else None
    n_rows = F.count(F.lit(1))
    if kind == "not_null":
        return (_frac(F.sum(F.when(c.isNull(), 1).otherwise(0)), n_rows),
                f"not_null({col_name})")
    if kind == "unique":
        non_null = F.count(c)
        return (_frac(non_null - F.count_distinct(c), non_null),
                f"unique({col_name})")
    if kind == "in_range":
        lo, hi = check["lo"], check["hi"]
        bad = c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))
        return (_frac(F.sum(F.when(bad, 1).otherwise(0)), F.count(c)),
                f"in_range({col_name},{lo},{hi})")
    if kind == "in_set":
        allowed = list(check["allowed"])
        bad = c.isNotNull() & ~c.isin(allowed)
        return (_frac(F.sum(F.when(bad, 1).otherwise(0)), F.count(c)),
                f"in_set({col_name})")
    if kind == "matches":
        pat = check["pattern"]
        bad = c.isNotNull() & ~c.rlike(pat)
        return (_frac(F.sum(F.when(bad, 1).otherwise(0)), F.count(c)),
                f"matches({col_name})")
    if kind == "min_rows":
        return (n_rows.cast("double"), "min_rows")
    raise ValueError(f"unknown check kind: {kind!r}")


def _severity(check: Mapping[str, Any]) -> str:
    sev = check.get("severity", "error")
    if sev not in SEVERITIES:
        raise ValueError(f"severity must be one of {SEVERITIES}, "
                         f"got {sev!r}")
    return sev


def _report_row(table: str, check_id: str, col_name: str,
                metric: Column, threshold: float,
                passed: Column, severity: str) -> list[Column]:
    return [F.lit(table).alias("table"),
            F.lit(check_id).alias("check"),
            F.lit(col_name).alias("column"),
            metric.alias("metric"),
            F.lit(float(threshold)).alias("threshold"),
            passed.alias("passed"),
            F.lit(severity).alias("severity")]


def check_suite(df: DataFrame, table: str,
                checks: Sequence[Mapping[str, Any]]) -> DataFrame:
    """Evaluate ``checks`` against ``df``; returns one row per check:
    (table, check, column, metric, threshold, passed).

    Check specs (dicts):

    - ``{"check": "not_null", "column": c, "max_frac": 0.0}`` —
      metric = null fraction of all rows.
    - ``{"check": "unique", "column": c, "max_frac": 0.0}`` —
      metric = duplicate fraction among non-null values
      (1 - distinct/non-null).
    - ``{"check": "in_range", "column": c, "lo": x, "hi": y,
      "max_frac": 0.0}`` — metric = fraction of non-null values
      outside [lo, hi].
    - ``{"check": "in_set", "column": c, "allowed": [...],
      "max_frac": 0.0}`` — metric = fraction of non-null values not in
      the set.
    - ``{"check": "matches", "column": c, "pattern": p,
      "max_frac": 0.0}`` — metric = fraction of non-null values not
      matching the (Java/RE2-intersection) regex.
    - ``{"check": "min_rows", "threshold": n}`` — metric = row count,
      passes when metric >= n (the one >= check).
    - ``{"check": "foreign_key", "column": c, "ref": parent_df,
      "ref_column": pc, "max_frac": 0.0}`` — metric = fraction of
      non-null child keys with no parent (orphans). NULL child keys
      are not orphans (SQL FK semantics); add not_null separately for
      mandatory relationships.

    Every spec also accepts ``"severity": "error" | "warn"`` (default
    ``error``): the report carries it through, and the gates (dq-check
    exit code, the corpus pipeline's contract pre-gate) fail only on
    error-severity violations — warn rows surface in the report
    without blocking the build (Deequ's warning level).

    All non-foreign-key checks run in one aggregate over one scan;
    each foreign_key adds one child-keys-vs-distinct-parent left join
    (see module docstring for the 100 TB shape).
    """
    scan_checks = [c for c in checks if c["check"] != "foreign_key"]
    fk_checks = [c for c in checks if c["check"] == "foreign_key"]
    parts: list[DataFrame] = []

    if scan_checks:
        metrics, ids = [], []
        for i, check in enumerate(scan_checks):
            m, cid = _scan_metric(check)
            metrics.append(m.alias(f"m{i}"))
            ids.append(cid)
        agged = df.agg(*metrics)
        rows = []
        for i, (check, cid) in enumerate(zip(scan_checks, ids)):
            metric = F.col(f"m{i}")
            if check["check"] == "min_rows":
                threshold = float(check["threshold"])
                passed = metric >= F.lit(threshold)
            else:
                threshold = float(check.get("max_frac", 0.0))
                passed = metric <= F.lit(threshold)
            rows.append(F.struct(*_report_row(
                table, cid, check.get("column", ""), metric, threshold,
                passed, _severity(check))))
        parts.append(
            agged.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))

    for check in fk_checks:
        col_name, ref_col = check["column"], check["ref_column"]
        threshold = float(check.get("max_frac", 0.0))
        child = (df.select(F.col(col_name).alias("k"))
                 .filter(F.col("k").isNotNull()))
        parent = (check["ref"].select(F.col(ref_col).alias("k"))
                  .filter(F.col("k").isNotNull()).distinct()
                  .withColumn("hit", F.lit(1)))
        agged = (child.join(parent, "k", "left")
                 .agg(_frac(F.sum(F.when(F.col("hit").isNull(), 1)
                                  .otherwise(0)),
                            F.count(F.lit(1))).alias("m")))
        metric = F.col("m")
        parts.append(agged.select(*_report_row(
            table, f"foreign_key({col_name}->{ref_col})", col_name,
            metric, threshold, metric <= F.lit(threshold),
            _severity(check))))

    if not parts:
        raise ValueError("check_suite requires at least one check")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table", "check")
