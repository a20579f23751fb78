"""Round-9 additions: the streaming ingest near-dup gate wired into the
corpus pipeline (r8 verdict item 6) and the exact-integer NBSVM quality
scorer's pipeline-facing behavior (item 5 lives in test_classify.py)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

BASE_US = 1_700_000_000_000_000
HOUR_US = 3_600_000_000


def _write_arrivals(path: str, rows) -> None:
    ids, texts, langs, ts = zip(*rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "ts_us": pa.array(ts, pa.int64()),
    }), path)


def _doc_text(i: int) -> str:
    # per-doc disjoint vocabulary: zero shared shingles between docs, so
    # the only band-key collisions are true same-content re-crawls
    return " ".join(f"w{i}x{j}" for j in range(12))


def test_corpus_pipeline_streaming_ingest_gate(spark, tmp_path):
    """A re-crawled document (same text, brand-new doc_id) arriving
    within the ingest watermark horizon of a PRIOR pipeline run is
    suppressed at the gate: it never appears in the staged corpus the
    batch stages read, and the funnel records it (ingest_raw > raw).
    The gate is incremental via the persistent checkpoint — run 2
    drains only the new arrivals."""
    from asvsp_spark.pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR

    ingest = tmp_path / "arrivals"
    ingest.mkdir()
    ckpt = str(tmp_path / "ingest_ckpt")
    staged = str(tmp_path / "staged")

    _write_arrivals(str(ingest / "b0.parquet"),
                    [(i, _doc_text(i), "en", BASE_US + i * HOUR_US)
                     for i in range(10)])
    c1 = run_corpus_pipeline(
        spark, SF_DIR, str(tmp_path / "out1"),
        quality_pct=0.0, targets={"en": 1.0},
        ingest_dir=str(ingest), ingest_checkpoint=ckpt,
        ingest_staged=staged)
    assert c1["ingest_raw"] == 10
    assert c1["raw"] == 10          # all distinct: nothing suppressed

    # run 2: one true re-crawl (doc 3's text verbatim, new id, inside
    # the 72h horizon of its first sighting) + one genuinely new doc
    _write_arrivals(str(ingest / "b1.parquet"),
                    [(1003, _doc_text(3), "en", BASE_US + 50 * HOUR_US),
                     (11, _doc_text(11), "en", BASE_US + 50 * HOUR_US)])
    c2 = run_corpus_pipeline(
        spark, SF_DIR, str(tmp_path / "out2"),
        quality_pct=0.0, targets={"en": 1.0},
        ingest_dir=str(ingest), ingest_checkpoint=ckpt,
        ingest_staged=staged)
    assert c2["ingest_raw"] == 12   # cumulative arrivals
    assert c2["raw"] == 11          # the re-crawl never reached batch

    staged_ids = {r.doc_id for r in
                  spark.read.parquet(staged).select("doc_id").collect()}
    assert staged_ids == set(range(10)) | {11}
    assert 1003 not in staged_ids
    # monotone funnel over the staged survivors
    assert c2["raw"] >= c2["quality_gated"] >= c2["exact_deduped"] \
        >= c2["near_deduped"] >= c2["rebalanced"] == c2["written"] > 0


def test_streaming_ingest_dedup_standalone_one_shot(spark, tmp_path):
    """Without a checkpoint the gate still dedups within one drain:
    same-batch same-content docs collapse to one survivor."""
    from asvsp_spark.pipeline import streaming_ingest_dedup

    ingest = tmp_path / "arrivals"
    ingest.mkdir()
    _write_arrivals(str(ingest / "b0.parquet"),
                    [(1, _doc_text(1), "en", BASE_US),
                     (2, _doc_text(1), "en", BASE_US + HOUR_US),  # dup
                     (3, _doc_text(3), "en", BASE_US)])
    out = streaming_ingest_dedup(spark, str(ingest),
                                 str(tmp_path / "staged"))
    got = {r.doc_id for r in out.select("doc_id").collect()}
    assert len(got) == 2 and 3 in got and len(got & {1, 2}) == 1


def test_ingest_gate_refuses_staged_reuse_without_checkpoint(spark, tmp_path):
    """Re-draining into a staged sink that already committed batches,
    with a FRESH checkpoint, would make the manifest sink silently skip
    batch 0 and drop every new arrival — the gate must refuse loudly."""
    from asvsp_spark.pipeline import streaming_ingest_dedup

    ingest = tmp_path / "arrivals"
    ingest.mkdir()
    staged = str(tmp_path / "staged")
    _write_arrivals(str(ingest / "b0.parquet"),
                    [(1, _doc_text(1), "en", BASE_US)])
    assert streaming_ingest_dedup(spark, str(ingest), staged).count() == 1
    _write_arrivals(str(ingest / "b1.parquet"),
                    [(2, _doc_text(2), "en", BASE_US)])
    with pytest.raises(ValueError, match="committed batches"):
        streaming_ingest_dedup(spark, str(ingest), staged)


def test_band_key_null_text_keys_by_id(spark):
    """NULL-text docs must key by their own id ('e'||id), not collapse
    onto a shared empty band key that a streaming dedup would then
    merge into one survivor (r9 review finding)."""
    from asvsp_spark.streaming.queries import with_doc_band_key
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "ab"), (4, _doc_text(4))],
        "doc_id long, text string")
    got = {r.doc_id: r.band_key for r in with_doc_band_key(df).collect()}
    assert got[1] == "e1" and got[2] == "e2"   # id-keyed, not ""
    assert got[3] == "e3"                       # < 3 tokens: id-keyed
    assert "_" in got[4]                        # real 4-hash band key


def test_nb_quality_scores_no_negative_labels(spark):
    """Degenerate corpus where every labeled doc is positive (uniform
    quality -> lo == hi): the calibrated predicted-positive rate is the
    labeled rate, i.e. every doc predicts 1 — and the DuckDB oracle's
    COALESCE(int64-min) branch mirrors it."""
    import duckdb
    from asvsp_spark.operators.classify import nb_quality_scores
    rows = [(i, "alpha beta gamma delta", "en") for i in range(8)]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
    out = nb_quality_scores(docs).collect()
    assert len(out) == 8 and all(r.predicted == 1 for r in out)
    # oracle twin agrees on the same degenerate corpus
    from asvsp_spark.plans.registry import all_oracle_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, 'alpha beta gamma delta', 'en')"
                            for i in range(8))
                + ") t(doc_id, text, lang)")
    orc = con.sql(all_oracle_sql()["quality_classifier_scores"]).fetchall()
    assert len(orc) == 8 and all(r[4] == 1 for r in orc)


def test_cli_corpus_pipeline_ingest_gate(spark, tmp_path, capsys):
    """CLI flavor of the ingest gate: --ingest-dir feeds the funnel and
    the printed counts carry the ingest_raw row."""
    from asvsp_spark.cli import main
    ingest = tmp_path / "arrivals"
    ingest.mkdir()
    _write_arrivals(str(ingest / "b0.parquet"),
                    [(i, _doc_text(i), "en", BASE_US + i * HOUR_US)
                     for i in range(6)]
                    + [(100, _doc_text(2), "en", BASE_US + 5 * HOUR_US)])
    out = str(tmp_path / "clean")
    rc = main(["corpus-pipeline", "--out-dir", out,
               "--ingest-dir", str(ingest),
               "--ingest-checkpoint", str(tmp_path / "ckpt")])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "ingest_raw" in printed
    # the separate raw funnel row, not the 'raw' substring of ingest_raw
    assert any(line.split() and line.split()[0] == "raw"
               for line in printed.splitlines())
    staged = spark.read.parquet(f"{out}/ingest_staged")
    ids = {r.doc_id for r in staged.select("doc_id").collect()}
    assert ids == set(range(6))   # the doc-2 re-crawl never staged


def test_corpus_pipeline_classifier_gate(spark, tmp_path):
    """Stage 2e: the learned gate keeps exactly the calibrated-positive
    docs, slots between the heuristic gate and exact dedup, and the
    funnel stays monotone."""
    from asvsp_spark.pipeline import run_corpus_pipeline
    from tests.conftest import SF_DIR
    out = str(tmp_path / "clean")
    counts = run_corpus_pipeline(spark, SF_DIR, out, classifier_gate=True)
    assert counts["raw"] >= counts["quality_gated"] \
        >= counts["classifier_gated"] >= counts["exact_deduped"] \
        >= counts["near_deduped"] >= counts["rebalanced"] \
        == counts["written"] > 0
    # the learned gate actually fires (the calibrated cut pins the
    # predicted-positive rate to the labeled rate, ~50% of extremes)
    assert counts["classifier_gated"] < counts["quality_gated"]


def test_gopher_flags_semantics(spark):
    """Constructed edge docs pin each Gopher rule: bullet-heavy,
    ellipsis-heavy, symbol-heavy, non-alphabetic and stopword-free docs
    each fail exactly their rule; a clean 60-word doc passes all."""
    from asvsp_spark.plans.registry import all_queries
    import tempfile, os
    good = ("the quick brown fox jumps over a lazy dog and keeps "
            "running through of the field in good weather " * 3
            + "is to end")                              # ~60 words, stopwords
    docs = [
        (0, good),
        (1, "- one\n- two\n- three\n- four\n- five"),   # all bullet lines
        (2, ("the story continues... \nmore of it... \n" * 5)
            + "and is a to end " + "word " * 50),        # ellipsis ends
        (3, ("# " * 40) + "the of a is to " + "word " * 50),  # symbols
        (4, "12 34 56 78 90 " * 12 + "the of a is"),     # digits, few alpha
        (5, "zebra " * 60),                              # no 2nd stopword
    ]
    d = tempfile.mkdtemp()
    (spark.createDataFrame(docs, "doc_id long, text string")
     .withColumn("lang", F.lit("en"))
     .withColumn("source", F.lit("test"))
     .withColumn("n_chars", F.length("text").cast("long"))
     .write.mode("overwrite")
     .parquet(os.path.join(d, "documents.parquet")))
    out = {r.doc_id: r for r in
           all_queries()["gopher_quality_report"](spark, d).collect()}
    assert out[0].gopher_pass == 1
    assert out[1].f_bullet_lines == 0 and out[1].gopher_pass == 0
    assert out[2].f_ellipsis_end == 0 and out[2].gopher_pass == 0
    assert out[3].f_symbol_ratio == 0 and out[3].gopher_pass == 0
    assert out[4].f_alpha_words == 0 and out[4].gopher_pass == 0
    assert out[5].f_stopwords == 0 and out[5].gopher_pass == 0


def test_c4_line_keep_rule(spark):
    """The C4 line rule on crafted lines: >= 5 words AND terminal
    punctuation survive; short, unpunctuated, or blank lines drop."""
    from asvsp_spark.functions.text import c4_line_keep_expr
    doc = "\n".join([
        "this line has exactly five words.",     # keep
        "short line.",                           # < 5 words
        "this line has five words too",          # no terminal punct
        "",                                      # blank
        'a longer quoted line ends with a quote."',  # keep
        "does this question have enough words?",     # keep
    ])
    df = (spark.createDataFrame([(1, doc)], "doc_id long, text string")
          .withColumn("lines", F.split("text", "\n"))
          .select(c4_line_keep_expr("lines").alias("kept")))
    kept = df.collect()[0].kept
    assert len(kept) == 3
    assert kept[0].startswith("this line has exactly")
    assert kept[1].endswith('"') and kept[2].endswith("?")


def test_gopher_c4_cross_engine_on_cr_and_vt_text(spark, tmp_path):
    """Adversarial line terminators and Java-only whitespace: CRLF
    docs (Java '$' matches before a final \\r, RE2's does not) and
    vertical-tab docs (\\x0B is Java-\\s but not RE2-\\s) previously
    made both new rule reports diverge from their DuckDB oracles while
    every fixture stayed green (r9 review findings 1-3; fixed via \\z
    anchors and the explicit whitespace class). Pin full hash parity
    on exactly those inputs."""
    import duckdb
    import hashlib
    import os
    from asvsp_spark.plans.registry import all_queries, all_oracle_sql

    docs = [
        (0, "this line has exactly five words.\r\nsecond line of five"
            " words.\r\nthird line has five words too.\r\n"),
        (1, "vertical\x0btab words are strange ... and the of a is to"
            " more words follow here now.\r"),
        (2, "ends with ellipsis ...\r"),
        (3, "clean doc. " + "the quick brown fox jumps over a lazy dog"
            " and keeps running. " * 4),
        (4, "a\x0bb c\x0bd " * 20 + "the of."),
    ]
    d = str(tmp_path)
    (spark.createDataFrame(docs, "doc_id long, text string")
     .withColumn("lang", F.lit("en"))
     .withColumn("source", F.lit("test"))
     .withColumn("n_chars", F.length("text").cast("long"))
     .write.mode("overwrite")
     .parquet(os.path.join(d, "documents.parquet")))

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM parquet_scan("
                f"'{os.path.join(d, 'documents.parquet')}/*.parquet')")

    def vhash(rows):
        h = hashlib.sha256()
        for r in sorted(tuple(str(v) for v in row) for row in rows):
            h.update("|".join(r).encode())
        return h.hexdigest()

    qs, osql = all_queries(), all_oracle_sql()
    for name in ("gopher_quality_report", "c4_quality_report"):
        sdf = qs[name](spark, d)
        scols = sorted(sdf.columns)
        srows = [[row[c] for c in scols] for row in sdf.collect()]
        drel = con.sql(osql[name])
        didx = [drel.columns.index(c) for c in sorted(drel.columns)]
        drows = [[r[i] for i in didx] for r in drel.fetchall()]
        assert scols == sorted(drel.columns), name
        assert len(srows) == len(drows) == 5, name
        assert vhash(srows) == vhash(drows), f"{name} diverged on CR/VT"
