"""Unit tests for the declarative data-quality suite
(operators/validate.py) — constructed frames with known violation
counts, covering every check kind, threshold semantics, FK NULL
handling and the error paths."""

import pytest
from pyspark.sql import Row, functions as F

from asvsp_spark.operators.validate import check_suite


def _report(df, table, checks):
    rows = check_suite(df, table, checks).collect()
    return {r["check"]: r for r in rows}


def test_scan_checks_metrics_and_pass(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="a", x=5.0),
         Row(k=2, v="b", x=50.0),
         Row(k=2, v="zz", x=None),
         Row(k=None, v=None, x=-1.0)])
    rep = _report(df, "t", [
        {"check": "not_null", "column": "k"},
        {"check": "unique", "column": "k"},
        {"check": "in_set", "column": "v", "allowed": ["a", "b"]},
        {"check": "in_range", "column": "x", "lo": 0.0, "hi": 10.0},
        {"check": "matches", "column": "v", "pattern": "^[a-z]$"},
        {"check": "min_rows", "threshold": 5},
    ])
    # 1 null k of 4 rows
    assert rep["not_null(k)"]["metric"] == pytest.approx(0.25)
    assert not rep["not_null(k)"]["passed"]
    # 3 non-null k, 2 distinct -> dup fraction 1/3
    assert rep["unique(k)"]["metric"] == pytest.approx(1 / 3, abs=1e-6)
    # 'zz' among 3 non-null v
    assert rep["in_set(v)"]["metric"] == pytest.approx(1 / 3, abs=1e-6)
    # 50.0 and -1.0 out of range among 3 non-null x
    assert rep["in_range(x,0.0,10.0)"]["metric"] == pytest.approx(
        2 / 3, abs=1e-6)
    assert rep["matches(v)"]["metric"] == pytest.approx(1 / 3, abs=1e-6)
    # 4 rows < floor of 5
    assert rep["min_rows"]["metric"] == 4.0
    assert not rep["min_rows"]["passed"]


def test_max_frac_threshold_allows_tolerated_violations(spark):
    df = spark.createDataFrame([Row(k=i if i else None) for i in range(10)])
    rep = _report(df, "t", [
        {"check": "not_null", "column": "k", "max_frac": 0.2},
    ])
    assert rep["not_null(k)"]["metric"] == pytest.approx(0.1)
    assert rep["not_null(k)"]["passed"]
    assert rep["not_null(k)"]["threshold"] == pytest.approx(0.2)


def test_foreign_key_orphans_and_null_children(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=9), Row(fk=None)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=1), Row(pk=2)])
    rep = _report(child, "c", [
        {"check": "foreign_key", "column": "fk",
         "ref": parent, "ref_column": "pk"},
    ])
    row = rep["foreign_key(fk->pk)"]
    # NULL child key is not an orphan; duplicate parents don't
    # duplicate children (distinct parent side): 1 orphan of 3
    assert row["metric"] == pytest.approx(1 / 3, abs=1e-6)
    assert not row["passed"]


def test_empty_table_violates_nothing_but_min_rows(spark):
    df = spark.createDataFrame([], "k int, v string")
    rep = _report(df, "t", [
        {"check": "not_null", "column": "k"},
        {"check": "unique", "column": "k"},
        {"check": "min_rows", "threshold": 1},
    ])
    assert rep["not_null(k)"]["metric"] == 0.0 and rep["not_null(k)"]["passed"]
    assert rep["unique(k)"]["passed"]
    assert rep["min_rows"]["metric"] == 0.0 and not rep["min_rows"]["passed"]


def test_report_shape_and_errors(spark):
    df = spark.createDataFrame([Row(k=1)])
    out = check_suite(df, "t", [{"check": "min_rows", "threshold": 1}])
    assert out.columns == ["table", "check", "column", "metric",
                           "threshold", "passed", "severity"]
    with pytest.raises(ValueError, match="at least one check"):
        check_suite(df, "t", [])
    with pytest.raises(ValueError, match="unknown check kind"):
        check_suite(df, "t", [{"check": "bogus", "column": "k"}])
    with pytest.raises(ValueError, match="severity"):
        check_suite(df, "t", [{"check": "min_rows", "threshold": 1,
                               "severity": "fatal"}])


def test_warn_severity_reports_but_never_gates(spark, tmp_path, capsys):
    """A warn-severity violation lands in the report with passed=False
    but neither dq-check's exit code nor the pipeline contract gate
    fails on it; an error-severity violation still gates."""
    import json
    from asvsp_spark.cli import main
    df = spark.createDataFrame([Row(k=1), Row(k=1)])
    rep = {r["check"]: r for r in check_suite(df, "t", [
        {"check": "unique", "column": "k", "severity": "warn"},
        {"check": "min_rows", "threshold": 1},
    ]).collect()}
    assert not rep["unique(k)"]["passed"]
    assert rep["unique(k)"]["severity"] == "warn"
    assert rep["min_rows"]["severity"] == "error"

    src = str(tmp_path / "t")
    df.write.parquet(src)
    spec = str(tmp_path / "spec.json")
    with open(spec, "w") as fh:
        json.dump([{"check": "unique", "column": "k",
                    "severity": "warn"}], fh)
    assert main(["dq-check", src, "--checks", spec]) == 0
    out = capsys.readouterr().out
    assert "WARN" in out and "(1 warn)" in out

    with open(spec, "w") as fh:
        json.dump([{"check": "unique", "column": "k"}], fh)
    assert main(["dq-check", src, "--checks", spec]) == 1


def test_pipeline_contract_warn_does_not_abort(spark, tmp_path):
    """A warn-only contract violation lets the corpus build proceed."""
    from asvsp_spark.pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR
    out = str(tmp_path / "warned")
    counts = run_corpus_pipeline(spark, SF_DIR, out, contract=[
        # impossible row floor, but warn-severity: report, don't gate
        {"check": "min_rows", "threshold": 10**12, "severity": "warn"},
    ])
    assert counts["contract_checks"] == 1 and counts["written"] > 0


def test_single_scan_plan_one_aggregate(spark):
    """All scan-shaped checks must compile into ONE aggregation over
    one pass — the plan may not scan the table once per check."""
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    out = check_suite(df, "t", [
        {"check": "not_null", "column": "k"},
        {"check": "in_range", "column": "v", "lo": 0, "hi": 6},
        {"check": "min_rows", "threshold": 1},
    ])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("range (0, 100") == 1


def test_cli_dq_check_gate(spark, tmp_path, capsys):
    """CLI dq-check: evaluates a JSON contract suite against a parquet
    dataset, writes the report, and exits 1 when any check fails —
    the ingest-gate contract."""
    import json
    from asvsp_spark.cli import main
    src = str(tmp_path / "orders")
    ref = str(tmp_path / "cust")
    spark.createDataFrame(
        [Row(ok=1, ck=1), Row(ok=2, ck=1), Row(ok=3, ck=99)]
    ).write.parquet(src)
    spark.createDataFrame([Row(c=1), Row(c=2)]).write.parquet(ref)
    good = str(tmp_path / "good.json")
    with open(good, "w") as fh:
        json.dump([{"check": "unique", "column": "ok"},
                   {"check": "min_rows", "threshold": 1}], fh)
    out = str(tmp_path / "report")
    assert main(["dq-check", src, "--checks", good, "--out", out]) == 0
    assert "2/2 checks passed" in capsys.readouterr().out
    rep = spark.read.parquet(out)
    assert rep.count() == 2 and rep.filter(~F.col("passed")).count() == 0

    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as fh:
        json.dump([{"check": "foreign_key", "column": "ck",
                    "ref": ref, "ref_column": "c"}], fh)
    assert main(["dq-check", src, "--checks", bad, "--table", "o"]) == 1
    assert "FAIL o.foreign_key(ck->c)" in capsys.readouterr().out


def test_corpus_pipeline_contract_gate(spark, tmp_path):
    """The pipeline's contract pre-gate: a passing suite records its
    check count and the build proceeds; a failing suite aborts before
    any output is written."""
    import glob
    from asvsp_spark.pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR
    out = str(tmp_path / "gated")
    counts = run_corpus_pipeline(spark, SF_DIR, out, contract=[
        {"check": "unique", "column": "doc_id"},
        {"check": "min_rows", "threshold": 1},
    ])
    assert counts["contract_checks"] == 2 and counts["written"] > 0

    bad_out = str(tmp_path / "refused")
    with pytest.raises(ValueError, match="contract violated.*min_rows"):
        run_corpus_pipeline(spark, SF_DIR, bad_out, contract=[
            {"check": "min_rows", "threshold": 10**12},
        ])
    assert not glob.glob(f"{bad_out}/corpus/*"), "must abort before write"
