"""Regression tests for the round-4 ADVICE findings (fixed round 5):

- split_expr weight validation (negative / zero / sub-resolution weights
  used to silently misallocate or empty a split);
- PII phone pattern word-boundary guards (3-3-4 runs embedded in longer
  digit strings used to be redacted);
- identifier quoting in catalog DDL/ANALYZE (backtick injection);
- semantic-dedup applyInPandas schema derived from the input id type
  (string ids used to fail at runtime against a hardcoded `long`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_split_expr_rejects_nonpositive_weights(spark):
    from asvsp_spark.operators.splits import split_expr
    with pytest.raises(ValueError, match="> 0"):
        split_expr("c", {"train": 0.9, "valid": -0.1, "test": 0.2})
    with pytest.raises(ValueError, match="> 0"):
        split_expr("c", {"train": 1.0, "valid": 0.0})


def test_split_expr_rejects_sub_resolution_weights(spark):
    from asvsp_spark.operators.splits import split_expr
    # 0.001 of 256 buckets truncates onto the previous boundary -> the
    # 'valid' split would be silently empty
    with pytest.raises(ValueError, match="1/256"):
        split_expr("c", {"train": 0.999, "valid": 0.001, "test": 0.5})
    # healthy weights still build
    assert split_expr("c", {"train": 0.8, "valid": 0.1, "test": 0.1}) \
        is not None


def test_phone_pattern_boundary_guards(spark):
    """3-3-4 digit runs embedded in longer digit strings are NOT phone
    matches; genuine phones (with or without +) are. Verified in both
    engines — the pattern must stay in the Java/RE2 intersection."""
    import duckdb
    from asvsp_spark.functions.text import PII_PATTERNS

    cases = [
        ("call 555-123-4567 now", 1),
        ("+555 123 4567", 1),
        ("id 9555-123-4567 trail", 0),     # leading digit glued on
        ("run 555-123-45678", 0),          # trailing digit glued on
        ("v123.456.78901 build", 0),       # long dotted id
        ("x 555.123.4567.", 1),            # trailing punctuation is fine
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string")
    got = {r.i: r.n for r in df.select(
        "i", F.regexp_count("t", F.lit(PII_PATTERNS["phone"])).alias("n")
    ).collect()}
    want = {i: n for i, (_, n) in enumerate(cases)}
    assert got == want

    con = duckdb.connect()
    duck = {
        i: con.execute(
            "SELECT len(regexp_extract_all(?, ?))",
            [t, PII_PATTERNS["phone"]]).fetchone()[0]
        for i, (t, _) in enumerate(cases)
    }
    assert duck == want


def test_quote_ident_doubles_backticks():
    from asvsp_spark.sources.catalog import _quote_ident
    assert _quote_ident("plain") == "`plain`"
    assert _quote_ident("we`ird") == "`we``ird`"
    # a name trying to break out of the quoting stays one identifier
    assert _quote_ident("x` DROP TABLE y --") == "`x`` DROP TABLE y --`"


def test_semantic_dedup_string_ids(spark):
    """The applyInPandas output schema follows the input id type; two
    near-identical vectors collapse to the lexicographically-first id."""
    from asvsp_spark.operators.similarity import semantic_dedup
    rows = [
        ("doc-a", [1.0, 0.0, 0.0]),
        ("doc-b", [0.9999, 0.0001, 0.0]),
        ("doc-c", [0.0, 1.0, 0.0]),
        ("doc-d", [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = {r.vec_id: r.is_keeper
           for r in semantic_dedup(df, threshold=0.95, n_cells=2).collect()}
    assert out["doc-a"] is True
    assert out["doc-b"] is False          # dup of doc-a, higher id
    assert sum(out.values()) == 3


def test_incremental_semantic_dedup_string_ids(spark, tmp_path):
    from asvsp_spark.operators.similarity import incremental_semantic_dedup
    store = str(tmp_path / "sem_store")
    b1 = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<double>")
    fresh1, c1 = incremental_semantic_dedup(spark, b1, store, threshold=0.95)
    assert c1["fresh"] == 2
    b2 = spark.createDataFrame(
        [("c", [0.9999, 0.0001]), ("d", [0.7, 0.7])],
        "vec_id string, embedding array<double>")
    fresh2, c2 = incremental_semantic_dedup(spark, b2, store, threshold=0.95)
    got = {r.vec_id for r in fresh2.collect()}
    assert got == {"d"} and c2["sem_dupes"] == 1
