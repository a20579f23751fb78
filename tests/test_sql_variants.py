"""Every q01-q10 SQL text variant must return the exact row set of its
DataFrame builder (SURVEY §7.0: both formulations provided; §3.2:
single-engine spark.sql path)."""

from __future__ import annotations

import pytest

from asvsp_spark.plans.registry import all_queries
from asvsp_spark.plans.sql_queries import EXT_NAMES, Q_NAMES, run_sql_variant
from tests.conftest import SF_DIR


def _rowset(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.collect()), cols


@pytest.mark.parametrize("name", Q_NAMES + EXT_NAMES)
def test_sql_variant_matches_dataframe(name, spark):
    df_rows, df_cols = _rowset(all_queries()[name](spark, SF_DIR))
    sql_rows, sql_cols = _rowset(run_sql_variant(spark, SF_DIR, name))
    assert df_cols == sql_cols
    assert df_rows == sql_rows


def test_leakage_split_sql_collapses_whitespace(spark):
    """Regression (r4 review, r9 class sweep): the ported fingerprint
    SQL must collapse whitespace, not delete letter-'s' runs — Spark
    SQL literals eat a single backslash, so the class escapes must
    arrive doubled (since r9 the pattern is the explicit Java∩RE2
    whitespace class rather than \\s, which Java widens with \\x0B).
    Pinned on a crafted corpus where eaten-backslash behavior gives
    different clusters."""
    from asvsp_spark.plans.sql_queries import SPARK_SQL
    sql = SPARK_SQL["leakage_split_report"]
    assert r"'[ \\t\\n\\f\\r]+'" in sql
    spark.createDataFrame(
        [(1, "same text"), (2, "same  text"),   # whitespace variants
         (3, "mass espresso")],                 # letter-s runs intact
        "doc_id long, text string").createOrReplaceTempView("documents")
    got = {r["split"]: (r["n_docs"], r["n_clusters"])
           for r in spark.sql(sql).collect()}
    assert sum(n for n, _ in got.values()) == 3
    assert sum(c for _, c in got.values()) == 2   # 1+2 share a cluster
