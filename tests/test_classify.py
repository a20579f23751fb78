"""Unit tests for model-based quality filtering
(operators/classify.py): separation on constructed corpora,
reproducibility, cold-start label bootstrap semantics, and agreement
with the heuristic on the real fixture."""

import pytest
from pyspark.sql import functions as F

from asvsp_spark.operators.classify import (heuristic_labels,
                                            score_quality,
                                            train_quality_classifier)

GOOD = ("the history of science is a long and detailed story about "
        "how people learned to test their ideas with evidence and "
        "careful measurement over many years")
BAD = ("buy now click here cheap cheap cheap winner winner free "
       "free free claim your prize now now now click click")


def _labeled(spark, n=20):
    rows = []
    for i in range(n):
        rows.append((2 * i, f"{GOOD} part {i}", 1))
        rows.append((2 * i + 1, f"{BAD} zzz {i}", 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int")


def test_classifier_separates_and_ranks(spark):
    labeled = _labeled(spark)
    model = train_quality_classifier(labeled)
    out = {r.doc_id: r for r in score_quality(labeled, model).collect()}
    # perfect separation on the training corpus (it's linearly separable)
    assert all(out[i].predicted == (1 - i % 2) for i in out)
    # and the probabilities rank good above bad
    worst_good = min(out[i].p_good for i in out if i % 2 == 0)
    best_bad = max(out[i].p_good for i in out if i % 2 == 1)
    assert worst_good > best_bad


def test_classifier_generalizes_to_unseen_docs(spark):
    model = train_quality_classifier(_labeled(spark))
    unseen = spark.createDataFrame(
        [(100, "scientists carefully measured the evidence over years"),
         (101, "click here free winner claim prize now cheap")],
        "doc_id long, text string")
    got = {r.doc_id: r.predicted for r in
           score_quality(unseen, model).collect()}
    assert got == {100: 1, 101: 0}


def test_classifier_deterministic(spark):
    labeled = _labeled(spark)
    s1 = score_quality(labeled, train_quality_classifier(labeled)).collect()
    s2 = score_quality(labeled, train_quality_classifier(labeled)).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


def test_heuristic_labels_extremes_only(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["the evidence shows that"] * (1 + i)), "en")
         for i in range(12)],
        "doc_id long, text string, lang string")
    lab = heuristic_labels(docs, frac=0.25)
    got = {r.doc_id: r.label for r in lab.collect()}
    # the ambiguous middle is excluded from training
    assert 0 < len(got) < 12
    assert set(got.values()) == {0, 1}
    # monotone heuristic: every 1-labeled doc is longer than every 0-labeled
    assert min(k for k, v in got.items() if v == 1) > \
        max(k for k, v in got.items() if v == 0)


def test_classifier_agrees_with_heuristic_on_fixture(spark):
    """End-to-end on the real documents table: trained on the heuristic
    extremes, the classifier must agree with the held-out heuristic
    label on >=90% of the labeled docs (the GPT-3-style sanity floor)."""
    from tests.conftest import SF_DIR
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("text").isNotNull()))
    labeled = heuristic_labels(docs)
    model = train_quality_classifier(labeled)
    scored = score_quality(labeled.select("doc_id", "text", "label"),
                           model, keep_cols=("label",))
    agree = scored.withColumn(
        "ok", (F.col("predicted") == F.col("label")).cast("int"))
    frac = agree.agg(F.avg("ok")).first()[0]
    assert frac >= 0.9, f"agreement {frac:.3f} below sanity floor"


def test_nb_quality_scores_separates(spark):
    """The exact-integer NBSVM-weight scorer (the oracle-paired
    registry path) separates the constructed corpus: every good doc
    scores strictly above every bad doc, and the sign gate agrees with
    the construction on the heuristic-labeled extremes."""
    from asvsp_spark.operators.classify import nb_quality_scores
    rows = ([(2 * i, f"{GOOD} part {i}", "en") for i in range(20)]
            + [(2 * i + 1, f"{BAD} zzz {i}", "en") for i in range(20)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r for r in nb_quality_scores(docs).collect()}
    assert len(out) == 40
    worst_good = min(out[i].score_micro for i in out if i % 2 == 0)
    best_bad = max(out[i].score_micro for i in out if i % 2 == 1)
    assert worst_good > best_bad
    # integer contract: exact int64 scores; the calibrated cut puts
    # every good doc above it and every bad doc at-or-below it on this
    # cleanly separable corpus
    assert all(isinstance(out[i].score_micro, int) for i in out)
    assert all(out[i].predicted == (1 - i % 2) for i in out)


def test_nb_quality_scores_agrees_with_heuristic_on_fixture(spark):
    """On the real documents fixture the integer scorer must agree
    with the held-out heuristic label on >=90% of labeled docs — the
    same sanity floor the mllib path is held to."""
    from tests.conftest import SF_DIR
    from asvsp_spark.operators.classify import nb_quality_scores
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("text").isNotNull()))
    labels = heuristic_labels(docs).select("doc_id", "label")
    scored = nb_quality_scores(docs).join(labels, "doc_id")
    frac = scored.agg(F.avg(
        (F.col("predicted") == F.col("label")).cast("int"))).first()[0]
    assert frac >= 0.9, f"agreement {frac:.3f} below sanity floor"


def test_cli_quality_score(spark, tmp_path, capsys):
    """CLI quality-score: bootstrap labels (no lang column), train,
    score every doc, and report the tau gate."""
    from asvsp_spark.cli import main
    src = str(tmp_path / "docs")
    rows = ([(2 * i, f"{GOOD} chapter {i}") for i in range(15)]
            + [(2 * i + 1, f"{BAD} xx {i}") for i in range(15)])
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    out = str(tmp_path / "scores")
    assert main(["quality-score", src, out, "--tau", "0.5",
                 "--features", "4096", "--max-iter", "10"]) == 0
    printed = capsys.readouterr().out
    assert "30 docs scored" in printed and "/30 pass" in printed
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "p_good", "predicted"}
    assert got.count() == 30
