"""Round-8 operators + the r7-advice regression pins:

- line_dedup_docs preserve_blanks (paragraph boundaries survive 2b);
- the combined line_dedup + paragraph_delimiter pipeline flags (the r7
  medium finding: line dedup used to erase every paragraph boundary,
  silently disabling stage 2c);
- batch_id=None warnings on the incremental store operators;
- the string-leading-dot phone redaction context;
- remove_dup_substring_runs keep-one semantics + pipeline stage 2d;
- gapfill week grain;
- sq15 streaming near-duplicate dedup eviction semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_line_dedup_preserve_blanks(spark):
    """preserve_blanks keeps blank lines in place (so '\\n\\n'
    paragraph boundaries survive) while still deduping non-blank
    lines; whitespace-only docs still empty out."""
    from asvsp_spark.operators.dedup import line_dedup_docs
    docs = spark.createDataFrame([
        (1, "a\nb\n\na\nc"),        # dup 'a' across a paragraph break
        (2, "x\n\n\nx\ny"),         # blank run preserved verbatim
        (3, "  \n \n"),             # whitespace-only: still empties
        (4, "p\nq"),                # untouched
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup_docs(docs, preserve_blanks=True).collect()}
    assert (out[1]["text"], out[1]["n_lines"], out[1]["n_removed"]) == \
        ("a\nb\n\nc", 4, 1)
    assert (out[2]["text"], out[2]["n_removed"]) == ("x\n\n\ny", 1)
    assert (out[3]["text"], out[3]["n_removed"]) == ("", 0)
    assert (out[4]["text"], out[4]["n_removed"]) == ("p\nq", 0)


def test_pipeline_line_plus_paragraph_dedup(spark, tmp_path):
    """The r7-advice medium finding, pinned: with BOTH line_dedup=True
    and paragraph_delimiter set, a corpus-wide repeated paragraph must
    still be stripped by stage 2c (line dedup used to erase the blank-
    line boundaries, so the paragraph pass saw one segment per doc and
    removed nothing)."""
    import os
    from asvsp_spark.pipeline import run_corpus_pipeline

    def filler(d):
        return " ".join(f"d{d}w{i} and of to in on for with"
                        for i in range(6))

    boiler = "all rights reserved contact admin for license terms"
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    f1, f2, f4 = filler(1), filler(2), filler(4)
    spark.createDataFrame(
        [(1, f"{boiler}\n\n{f1} alpha\ndup line {f1}\ndup line {f1}",
          "web", "en"),
         (2, f"{boiler}\n\n{f2} body two", "web", "en"),
         (4, f"{f4} solo", "web", "en")],
        "doc_id long, text string, source string, lang string"
    ).withColumn("n_chars", F.length("text").cast("long")) \
     .write.parquet(f"{sf}/documents.parquet")

    out = str(tmp_path / "corpus_out")
    counts = run_corpus_pipeline(
        spark, sf, out, quality_pct=0.0, line_dedup=True,
        paragraph_delimiter=r"\n{2,}", paragraph_joiner="\n\n")
    assert counts["line_deduped"] == 3
    assert counts["paragraph_deduped"] == 3
    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(f"{out}/corpus").collect()}
    # line dedup still fired inside doc 1
    assert corpus[1].count("dup line") == 1
    # the repeated boilerplate paragraph survives ONCE corpus-wide:
    # kept in doc 1 (smallest doc id), stripped from doc 2
    assert boiler in corpus[1]
    assert boiler not in corpus[2]
    # doc 2's own body survived the strip
    assert f"{f2} body two" in corpus[2]


def test_incremental_store_ops_warn_without_batch_id(spark, tmp_path):
    """The r7 advice: un-stamped incremental store calls have silent
    replay failure modes (halved substring threshold / emptied delta
    docs), so batch_id=None must warn — and a stamped call must not."""
    import warnings
    from asvsp_spark.operators.dedup import (incremental_dup_substring,
                                             incremental_paragraph_dedup)
    docs = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6 w7 w8")], "doc_id long, text string")
    with pytest.warns(UserWarning, match="halving the effective"):
        incremental_dup_substring(spark, docs,
                                  str(tmp_path / "wins"))[0].count()
    with pytest.warns(UserWarning, match="rebuilds all its documents"):
        incremental_paragraph_dedup(spark, docs,
                                    str(tmp_path / "segs"))[0].count()
    with warnings.catch_warnings():
        # UserWarning only: py4j GC-time ResourceWarnings are unrelated
        warnings.simplefilter("error", UserWarning)
        incremental_dup_substring(spark, docs, str(tmp_path / "wins2"),
                                  batch_id="b1")[0].count()
        incremental_paragraph_dedup(spark, docs, str(tmp_path / "segs2"),
                                    batch_id="b1")[0].count()
